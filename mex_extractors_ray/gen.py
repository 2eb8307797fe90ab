"""Deterministic synthetic change-log / base-table generation.

Follows the reference's seeded-synthetic-corpus discipline
(``mex/extractors/artificial/main.py:23-34``: faker with ``seed=42``) — every
byte is a pure function of the seed, so reruns are byte-identical and the
single-process replayer can serve as an exact oracle.

Two modes:

1. :func:`synth_change_log` — pure seeded numpy generation at any scale
   (tests use ~1e4 events, bench scales to 1e7+; shaped toward the 1e10
   target). Writes sharded Parquet so `ray.data.read_parquet` parallelizes.
2. :func:`change_log_from_events` — a *closed-form* derivation of a change
   log from the driver's ``events`` table (TESTDATA.md). Every derived value
   (op, tokens, n_tok, source, lang, schema_version) is an arithmetic
   function of (event_id, user_id), so the exact same log — and therefore
   the exact final CDC state — is expressible in DuckDB SQL. This is what
   lets the driver hash-check the full engine end-to-end.

Closed forms (mirrored in pipelines/catalog.py oracle SQL):

    lsn            = event_id
    doc_id         = 'doc-' || user_id
    op             = 'delete' if event_type='error'
                     else 'insert' if event_type='signup' else 'update'
    n_tok          = 8 + (lsn % 120)                        (null for deletes)
    tokens[i]      = (user_id*2654435761 + i*40503) % 50000 (int32)
    source         = 'src' || (user_id % 6)
    schema_version = 2 if lsn%10==8 else 3 if lsn%10==9 else 1
    lang           = ('de','en','fr','es')[user_id % 4]     (only when sv>=2)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOKEN_VOCAB = 50_000
_LANGS = np.array(["de", "en", "fr", "es"])
_SOURCES = np.array([f"src{i}" for i in range(6)])


def _tokens_list_array(user_id: np.ndarray, n_tok: np.ndarray) -> pa.ListArray:
    """Vectorized closed-form token lists: one ListArray, no per-row Python."""
    n = n_tok.astype(np.int64)
    offsets = np.zeros(len(n) + 1, dtype=np.int32)
    np.cumsum(n, out=offsets[1:])
    total = int(offsets[-1])
    starts = offsets[:-1].astype(np.int64)
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
    uid = np.repeat(user_id.astype(np.int64), n)
    values = ((uid * 2654435761 + local * 40503) % TOKEN_VOCAB).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))


def change_log_from_events(events: pa.Table) -> pa.Table:
    """Closed-form change log from the driver's ``events`` table (see module
    docstring). Output schema: lsn:int64, op:string, doc_id:string,
    tokens:list<int32>, n_tok:int32|int64 (per schema_version),
    source:string, schema_version:int32, lang:string (nullable).
    """
    lsn = np.asarray(events["event_id"].combine_chunks(), dtype=np.int64)
    user = np.asarray(events["user_id"].combine_chunks(), dtype=np.int64)
    etype = events["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    op = np.where(etype == "error", "delete", np.where(etype == "signup", "insert", "update"))
    is_del = op == "delete"
    n_tok = (8 + (lsn % 120)).astype(np.int64)
    n_tok_gen = np.where(is_del, 0, n_tok)
    tokens = _tokens_list_array(user, n_tok_gen)
    sv = np.where(lsn % 10 == 8, 2, np.where(lsn % 10 == 9, 3, 1)).astype(np.int32)
    lang = _LANGS[user % 4]
    doc_id = np.char.add("doc-", user.astype(np.str_))
    source = _SOURCES[user % 6]
    t = pa.table(
        {
            "lsn": pa.array(lsn),
            "op": pa.array(op),
            "doc_id": pa.array(doc_id),
            "tokens": tokens,
            "n_tok": pa.array(np.where(is_del, -1, n_tok), pa.int64()),
            "source": pa.array(source),
            "schema_version": pa.array(sv),
            "lang": pa.array(lang),
        }
    )
    # null out payload on deletes; null lang below v2 (the column doesn't
    # exist in v1 — modeled as null so one Arrow schema can hold mixed
    # versions within a file; resolution fills the v2+ default)
    import pyarrow.compute as pc

    del_mask = pa.array(is_del)
    v1_mask = pa.array(sv < 2)
    t = t.set_column(3, "tokens", pc.if_else(del_mask, pa.nulls(len(t), t["tokens"].type), t["tokens"]))
    t = t.set_column(4, "n_tok", pc.if_else(del_mask, pa.nulls(len(t), pa.int64()), t["n_tok"]))
    t = t.set_column(7, "lang", pc.if_else(v1_mask, pa.nulls(len(t), pa.string()), t["lang"]))
    return t


def patch_log_from_events(events: pa.Table) -> pa.Table:
    """Closed-form PARTIAL-UPDATE change log from the driver's ``events``
    table — the column-level-merge (Debezium-style sparse update) fixture.

    Per doc (= user), events ordered by lsn (= event_id):

    - the FIRST event (any type except error) is a full ``insert`` setting
      every column;
    - ``error`` events are ``delete``s (payload all null);
    - every later non-error event is a ``patch`` carrying ONLY the columns
      selected by ``lsn % 3`` (0 → tokens+n_tok, 1 → lang, 2 → source),
      all other data columns null = "unchanged".

    Every set value is lsn-dependent so a wrong merge order is observable:

        n_tok   = 8 + (lsn % 120)
        tokens[i] = (user*2654435761 + i*40503 + lsn*7919) % 50000
        lang    = ('de','en','fr','es')[(user + lsn) % 4]
        source  = 'src' || ((user + lsn) % 6)

    The exact same derivation is expressible in DuckDB SQL (see
    ``_CDC_PATCH_SQL`` in pipelines/catalog.py), so the engine's ``patch``
    apply mode is hash-checkable end to end. All rows are schema v3.
    """
    import pyarrow.compute as pc

    t = events.select(["event_id", "user_id", "event_type"]).sort_by(
        [("user_id", "ascending"), ("event_id", "ascending")]
    )
    lsn = np.asarray(t["event_id"].combine_chunks(), dtype=np.int64)
    user = np.asarray(t["user_id"].combine_chunks(), dtype=np.int64)
    etype = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    is_del = etype == "error"
    # first NON-DELETE event per user (sorted by user, lsn): a delete may
    # precede the first insert — it must stay a delete, not become the insert
    first_any = np.ones(len(user), dtype=bool)
    first_any[1:] = user[1:] != user[:-1]
    # rank of non-delete events within each user run
    nd = (~is_del).astype(np.int64)
    cum = np.cumsum(nd)
    run_base = np.maximum.accumulate(np.where(first_any, cum - nd, 0))
    nd_rank = cum - run_base  # 1 for the first non-delete of each user
    is_insert = (~is_del) & (nd_rank == 1)
    is_patch = (~is_del) & ~is_insert
    op = np.where(is_del, "delete", np.where(is_insert, "insert", "patch"))

    m = lsn % 3
    set_tok = is_insert | (is_patch & (m == 0))
    set_lang = is_insert | (is_patch & (m == 1))
    set_source = is_insert | (is_patch & (m == 2))

    n_tok = (8 + (lsn % 120)).astype(np.int64)
    tokens = _patch_tokens_list_array(user, lsn, np.where(set_tok, n_tok, 0))
    lang = _LANGS[(user + lsn) % 4]
    source = np.char.add("src", ((user + lsn) % 6).astype(np.str_))
    doc_id = np.char.add("doc-", user.astype(np.str_))
    out = pa.table(
        {
            "lsn": pa.array(lsn),
            "op": pa.array(op),
            "doc_id": pa.array(doc_id),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, pa.int64()),
            "source": pa.array(source),
            "schema_version": pa.array(np.full(len(lsn), 3, np.int32)),
            "lang": pa.array(lang),
        }
    )
    unset = lambda col, mask, typ: pc.if_else(  # noqa: E731
        pa.array(~mask), pa.nulls(len(out), typ), col
    )
    out = out.set_column(3, "tokens", unset(out["tokens"], set_tok, out["tokens"].type))
    out = out.set_column(4, "n_tok", unset(out["n_tok"], set_tok, pa.int64()))
    out = out.set_column(5, "source", unset(out["source"], set_source, pa.string()))
    out = out.set_column(7, "lang", unset(out["lang"], set_lang, pa.string()))
    return out.sort_by([("lsn", "ascending")])


def _patch_tokens_list_array(user_id: np.ndarray, lsn: np.ndarray,
                             n_tok: np.ndarray) -> pa.ListArray:
    """Patch-fixture token lists: lsn enters the value formula so the merged
    row proves WHICH event's tokens won."""
    n = n_tok.astype(np.int64)
    offsets = np.zeros(len(n) + 1, dtype=np.int32)
    np.cumsum(n, out=offsets[1:])
    total = int(offsets[-1])
    starts = offsets[:-1].astype(np.int64)
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
    uid = np.repeat(user_id.astype(np.int64), n)
    ls = np.repeat(lsn.astype(np.int64), n)
    values = ((uid * 2654435761 + local * 40503 + ls * 7919) % TOKEN_VOCAB).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))


def synth_change_log(
    out_dir: str | Path,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    shard_rows: int = 250_000,
    hot_key_fraction: float = 0.01,
    hot_key_update_share: float = 0.2,
    schema_mix: bool = True,
    lsn_start: int = 0,
    zipf_alpha: float | None = None,
) -> list[str]:
    """Write a seeded synthetic change log as sharded Parquet; returns paths.

    Ops ≈ 60/30/10 insert/update/delete (FIXTURES.md §1.2). The top
    ``hot_key_fraction`` of doc ids receive ``hot_key_update_share`` of all
    updates (skew fixture). LSNs are strictly increasing with gaps.
    Deterministic for (n_events, n_docs, seed, shard_rows): shard i is a pure
    function of the seed, so regeneration is byte-identical.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths: list[str] = []
    n_hot = max(1, int(n_docs * hot_key_fraction))
    # lsn_start > an existing lake's watermark makes this log a follow-on
    # ingest window (the steady-state tailing fixture)
    lsn_base = int(lsn_start)
    for shard, start in enumerate(range(0, n_events, shard_rows)):
        rows = min(shard_rows, n_events - start)
        rng = np.random.default_rng([seed, shard])
        gaps = rng.integers(1, 4, size=rows, dtype=np.int64)
        lsn = lsn_base + np.cumsum(gaps)
        lsn_base = int(lsn[-1])
        r = rng.random(rows)
        op = np.where(r < 0.6, "insert", np.where(r < 0.9, "update", "delete"))
        if zipf_alpha is not None:
            # heavy-tail regime (the skew rehearsal): doc draws follow
            # Zipf(alpha) folded into the doc space — at alpha~1.1 the top
            # key alone takes ~1/zeta(alpha) of ALL events
            uid = ((rng.zipf(zipf_alpha, size=rows) - 1) % n_docs).astype(np.int64)
        else:
            hot = rng.random(rows) < hot_key_update_share
            uid = np.where(
                hot,
                rng.integers(0, n_hot, size=rows),
                rng.integers(0, n_docs, size=rows),
            ).astype(np.int64)
        is_del = op == "delete"
        n_tok = (8 + (lsn % 120)).astype(np.int64)
        tokens = _tokens_list_array(uid, np.where(is_del, 0, n_tok))
        if schema_mix:
            sv = np.where(lsn % 10 == 8, 2, np.where(lsn % 10 == 9, 3, 1)).astype(np.int32)
        else:
            sv = np.ones(rows, dtype=np.int32)
        import pyarrow.compute as pc

        t = pa.table(
            {
                "lsn": pa.array(lsn),
                "op": pa.array(op),
                "doc_id": pa.array(np.char.add("doc-", uid.astype(np.str_))),
                "tokens": tokens,
                "n_tok": pa.array(np.where(is_del, -1, n_tok), pa.int64()),
                "source": pa.array(_SOURCES[uid % 6]),
                "schema_version": pa.array(sv),
                "lang": pa.array(_LANGS[uid % 4]),
            }
        )
        del_mask = pa.array(is_del)
        t = t.set_column(3, "tokens", pc.if_else(del_mask, pa.nulls(rows, t["tokens"].type), t["tokens"]))
        t = t.set_column(4, "n_tok", pc.if_else(del_mask, pa.nulls(rows, pa.int64()), t["n_tok"]))
        t = t.set_column(7, "lang", pc.if_else(pa.array(sv < 2), pa.nulls(rows, pa.string()), t["lang"]))
        path = out / f"log-{shard:05d}.parquet"
        pq.write_table(t, path, compression="snappy")
        paths.append(str(path))
    return paths
