"""Persisted inverted token index (posting lists) over a text corpus.

The reference answers "which records contain value X?" by scanning every
record per query (per-field filters, e.g. ``mex/extractors/ff_projects/
filter.py`` predicates); at corpus scale a term lookup must not scan the
corpus. This module builds a PERSISTED index once and serves term lookups
at cost ∝ len(terms) + postings touched, never corpus size:

- :func:`build_token_index` — per batch, distinct (token, doc_id) pairs
  with per-pair term frequency and doc length (map-side dedup: the
  shuffle ships each doc's distinct vocab, never repeated occurrences);
  ONE coarse hash shuffle on the token (the ``dedup._keyed_blocks``
  discipline); per bucket a token-sorted posting file
  ``bucket=K.parquet`` with columns (token, df, doc_ids ascending, tfs,
  dlens) — tf/dlen ride along so ranked retrieval (:func:`bm25_topk`)
  needs nothing but the term-routed reads.
  Buckets are written independently via temp+rename (``resume=True``
  skips buckets whose file already exists — a failed build finishes by
  rewriting only the missing ones), and a term's bucket is recomputable
  from the term alone (``hashing.assign_partitions``), so a lookup opens
  only the files its terms hash to.
- :func:`lookup_token_docs` — per-bucket parquet read with a
  ``token in terms`` filter (the file is token-sorted with small row
  groups, so parquet column stats prune row groups), then numpy set
  kernels for any-of (union) / all-of (intersection) semantics.
- ``max_df`` — stopword-scale tokens can be EXCLUDED at build time: a
  100-TB corpus's "the" posting list IS the corpus. Dropped tokens are
  recorded in ``_index_meta.json`` (no silent cap) and a lookup that
  names one raises instead of silently returning nothing.

Scale shape: build = one explode + one coarse exchange, output
partitioned by token hash (resumable); postings bounded by ``max_df``;
lookups are manifest-routed point reads, the same asymptotics as the
lake's ``cdc_point_lookups``.
"""

from __future__ import annotations

import json
import os
from functools import reduce
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.hashing import assign_partitions, shard_tags

META_NAME = "_index_meta.json"
_ROW_GROUP_ROWS = 4096


def _doc_token_stats(t: pa.Table, text_col: str, id_col: str,
                     pattern: str, positions: bool = False) -> pa.Table:
    """(token, doc_id, tf, dlen[, poss]) rows for one batch — one per
    DISTINCT (token, doc) pair (the map-side combiner: the shuffle ships
    each doc's vocabulary once, never repeated occurrences), carrying the
    pair's term frequency and the doc's total token count. With
    ``positions=True`` each pair also carries its 0-based occurrence
    positions (over the kept tokens) as a list — phrase/proximity queries
    need them; they make the shuffle occurrence-scale (inherent to
    positional indexes). A doc's text lives in one row, so everything is
    complete within the batch. All Arrow/numpy kernels."""
    words = pc.split_pattern(pc.fill_null(t[text_col], ""), pattern)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    offsets = np.asarray(words.offsets, dtype=np.int64)
    rows = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                     np.diff(offsets))
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    keep = np.asarray(keep, dtype=bool)
    r = rows[keep]
    dlen_per_row = (np.bincount(r, minlength=t.num_rows).astype(np.int64)
                    if t.num_rows else np.zeros(0, np.int64))
    if not positions:
        pairs = pa.table({
            "token": flat.filter(pa.array(keep)),
            "_row": pa.array(r),
        })
        g = pairs.group_by(["token", "_row"]).aggregate([("_row", "count")])
        gr = np.asarray(g["_row"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "token": g["token"],
            "doc_id": ids.take(pa.array(gr)),
            "tf": g["_row_count"].combine_chunks().cast(pa.int64()),
            "dlen": pa.array(dlen_per_row[gr] if len(gr) else
                             np.zeros(0, np.int64)),
        })
    # positional path: 0-based position over the KEPT tokens, grouped into
    # one list per (row, token) pair by a sort + run-boundary pass
    run_first = np.zeros(len(r), dtype=np.int64)
    if len(r):
        starts = np.flatnonzero(np.diff(r, prepend=-1))
        run_first = np.repeat(starts, np.diff(np.append(starts, len(r))))
    pos = np.arange(len(r), dtype=np.int64) - run_first
    occ = pa.table({
        "token": flat.filter(pa.array(keep)),
        "_row": pa.array(r),
        "_pos": pa.array(pos.astype(np.int32)),
    }).sort_by([("_row", "ascending"), ("token", "ascending"),
                ("_pos", "ascending")])
    from mex_extractors_ray.stages.dedup import _run_starts

    pair_start = (_run_starts(occ["_row"]) | _run_starts(occ["token"]))
    sidx = np.flatnonzero(pair_start)
    n_occ = occ.num_rows
    counts = np.diff(np.append(sidx, n_occ)).astype(np.int64)
    off = pa.array(np.append(sidx, n_occ), pa.int32())
    pos_vals = occ["_pos"].combine_chunks()
    if isinstance(pos_vals, pa.ChunkedArray):
        pos_vals = (pos_vals.chunk(0) if pos_vals.num_chunks
                    else pa.array([], pa.int32()))
    gr = np.asarray(occ["_row"].combine_chunks(), dtype=np.int64)[sidx] \
        if n_occ else np.zeros(0, np.int64)
    return pa.table({
        "token": occ["token"].combine_chunks().take(pa.array(sidx)),
        "doc_id": ids.take(pa.array(gr)),
        "tf": pa.array(counts),
        "dlen": pa.array(dlen_per_row[gr] if len(gr) else
                         np.zeros(0, np.int64)),
        "poss": pa.ListArray.from_arrays(off, pos_vals),
    })


def bucket_path(index_dir: str | Path, bucket: int) -> Path:
    return Path(index_dir) / f"bucket={bucket:05d}.parquet"


def build_token_index(ds, index_dir: str | Path, text_col: str = "text",
                      id_col: str = "doc_id", num_buckets: int = 64,
                      pattern: str = " ", max_df: int | None = None,
                      resume: bool = False, positions: bool = False) -> dict:
    """Build the index; returns a build report (one row per bucket,
    manifest-scale). ``resume=True`` skips already-written buckets.
    ``positions=True`` stores per-pair occurrence positions (phrase /
    proximity queries; occurrence-scale shuffle and index — opt-in)."""
    from mex_extractors_ray.stages.dedup import _run_starts

    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        p = _doc_token_stats(t, text_col, id_col, pattern, positions=positions)
        return p.append_column(
            "_kpart", shard_tags(assign_partitions(p["token"], num_buckets),
                                 num_buckets))

    def write_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_kpart"])
        if g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "tokens": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.int64()),
                             "skipped": pa.array([], pa.bool_()),
                             "dropped": pa.array([], pa.list_(pa.string()))})
        bucket = int(assign_partitions(g["token"].slice(0, 1), num_buckets)[0])
        path = bucket_path(index_dir, bucket)
        if resume and path.exists():
            return pa.table({"bucket": [bucket], "tokens": [-1],
                             "postings": [-1], "skipped": [True],
                             "dropped": [[]]},
                            schema=_REPORT_SCHEMA)
        # tf + dlen (+ positions) travel WITH the posting so ranked and
        # phrase retrieval need nothing but the term-routed reads
        t = g.sort_by([("token", "ascending"), ("doc_id", "ascending")])
        out = _rows_to_postings(t)
        counts = np.asarray(out["df"].combine_chunks(), dtype=np.int64)
        dropped: list[str] = []
        if max_df is not None:
            over = counts > max_df
            if over.any():
                dropped = out["token"].combine_chunks().filter(
                    pa.array(over)).to_pylist()
                out = out.filter(pa.array(~over))
        tmp = path.with_suffix(".parquet.tmp")
        pq.write_table(out, tmp, row_group_size=_ROW_GROUP_ROWS)
        os.replace(tmp, path)
        return pa.table({"bucket": [bucket], "tokens": [out.num_rows],
                         "postings": [int(counts.sum())], "skipped": [False],
                         "dropped": [dropped]}, schema=_REPORT_SCHEMA)

    # corpus stats for BM25 (N, total token length → avgdl): a separate
    # cheap aggregation pass (O(batches) partial rows on the driver). It
    # re-reads the text column once; the index build is one-time and
    # IO-bound, so the extra read is noise next to the shuffle.
    def _len_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.fill_null(t[text_col], ""), pattern)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        n_tok = int(pc.sum(pc.cast(pc.greater(pc.utf8_length(flat), 0),
                                   pa.int64())).as_py() or 0)
        return pa.table({"n_docs": pa.array([t.num_rows], pa.int64()),
                         "total_len": pa.array([n_tok], pa.int64())})

    parts = ds.map_batches(_len_partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    total_len = sum(r["total_len"] for r in parts)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    try:
        grouped = tagged.groupby("_kpart", num_partitions=num_buckets)
    except TypeError:
        grouped = tagged.groupby("_kpart")
    report = grouped.map_groups(write_bucket, batch_format="pyarrow").take_all()

    dropped_all = sorted({w for r in report for w in (r["dropped"] or [])})
    meta = {"num_buckets": num_buckets, "text_col": text_col,
            "id_col": id_col, "pattern": pattern, "max_df": max_df,
            "n_docs": n_docs, "total_len": total_len,
            "positions": positions,
            # bounded by nature: only stopword-scale tokens exceed max_df
            "dropped_tokens": dropped_all[:4096],
            "dropped_token_count": len(dropped_all)}
    meta_tmp = index_dir / (META_NAME + ".tmp")
    meta_tmp.write_text(json.dumps(meta))
    os.replace(meta_tmp, index_dir / META_NAME)
    return {"buckets": len({r["bucket"] for r in report}),
            "tokens": sum(r["tokens"] for r in report if not r["skipped"]),
            "postings": sum(r["postings"] for r in report if not r["skipped"]),
            "skipped_buckets": sum(1 for r in report if r["skipped"]),
            "dropped_tokens": len(dropped_all)}


_REPORT_SCHEMA = pa.schema([
    ("bucket", pa.int32()), ("tokens", pa.int64()), ("postings", pa.int64()),
    ("skipped", pa.bool_()), ("dropped", pa.list_(pa.string())),
])


def load_index_meta(index_dir: str | Path) -> dict:
    p = Path(index_dir) / META_NAME
    if not p.exists():
        raise ValueError(f"no token index at {index_dir} ({META_NAME} missing)")
    return json.loads(p.read_text())


def _term_postings(index_dir: str | Path, meta: dict, bucket: int,
                   bterms: list[str]) -> pa.Table | None:
    """LIST-format posting rows for ``bterms`` in one bucket. Fast path
    (no segments): one filtered read of the base file. With committed
    segments: fold base + segments for those terms, then re-list."""
    if not meta.get("segments"):
        path = bucket_path(index_dir, bucket)
        if not path.exists():
            return None
        return pq.read_table(path, filters=[("token", "in", bterms)])
    rows = folded_bucket_rows(index_dir, bucket, meta, terms=bterms)
    return None if rows is None else _rows_to_postings(rows)


def lookup_token_docs(index_dir: str | Path, terms: tuple[str, ...] | list[str],
                      mode: str = "all") -> pa.Table:
    """doc_ids containing ANY (union) / ALL (intersection) of ``terms``.

    Reads only the bucket files the terms hash to; each read carries a
    ``token in terms`` filter so parquet row-group stats on the sorted
    token column prune inside the file. Driver state ∝ postings of the
    requested terms — the lookup IS the operator (the point-lookup
    discipline of ``cdc/apply.lookup_docs``)."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    if not terms:
        raise ValueError("lookup_token_docs: empty term list")
    meta = load_index_meta(index_dir)
    dropped = set(meta.get("dropped_tokens", []))
    hit = dropped.intersection(terms)
    if hit:
        raise ValueError(
            f"terms {sorted(hit)} were dropped at build time (df > "
            f"{meta['max_df']}); rebuild without max_df to index them")
    buckets: dict[int, list[str]] = {}
    parts = assign_partitions(pa.array(list(terms), pa.string()),
                              meta["num_buckets"])
    for term, b in zip(terms, parts):
        buckets.setdefault(int(b), []).append(term)
    postings: dict[str, np.ndarray] = {}
    id_type = None
    for b, bterms in sorted(buckets.items()):
        t = _term_postings(index_dir, meta, b, bterms)
        if t is None:  # no token hashed there at build time
            continue
        id_type = t["doc_ids"].type.value_type
        toks = t["token"].to_pylist()
        lists = t["doc_ids"].combine_chunks()
        for i, tok in enumerate(toks):
            postings[tok] = np.asarray(lists[i].values.to_numpy(
                zero_copy_only=False))
    if id_type is None:
        id_type = pa.int64()
    if mode == "any":
        arrs = [v for v in postings.values()]
        out = (np.unique(np.concatenate(arrs)) if arrs
               else np.array([], dtype=np.int64))
    else:
        if len(postings) < len(set(terms)):  # some term has no postings
            out = np.array([], dtype=np.int64)
        else:
            # intersect smallest-first: cost tracks the rarest term
            arrs = sorted(postings.values(), key=len)
            out = reduce(np.intersect1d, arrs[1:], arrs[0])
    return pa.table({"doc_id": pa.array(out).cast(id_type)})


def token_df(index_dir: str | Path, terms: tuple[str, ...] | list[str]) -> pa.Table:
    """Document frequency per term (0 for unindexed terms) — same routed
    point read as :func:`lookup_token_docs`, postings column not loaded."""
    meta = load_index_meta(index_dir)
    parts = assign_partitions(pa.array(list(terms), pa.string()),
                              meta["num_buckets"])
    buckets: dict[int, list[str]] = {}
    for term, b in zip(terms, parts):
        buckets.setdefault(int(b), []).append(term)
    dfs: dict[str, int] = {t: 0 for t in terms}
    for b, bterms in sorted(buckets.items()):
        t = _term_postings(index_dir, meta, b, bterms)
        if t is None:
            continue
        for tok, df in zip(t["token"].to_pylist(), t["df"].to_pylist()):
            dfs[tok] = int(df)
    return pa.table({"token": pa.array(list(terms), pa.string()),
                     "df": pa.array([dfs[t] for t in terms], pa.int64())})


def segment_path(index_dir: str | Path, bucket: int, update_id: str) -> Path:
    return Path(index_dir) / f"bucket={bucket:05d}.seg-{update_id}.parquet"


_LIST_COLS = (("doc_ids", "doc_id"), ("tfs", "tf"), ("dlens", "dlen"),
              ("poss", "poss"))


def _explode_postings(t: pa.Table) -> pa.Table:
    """List-format posting rows → flat (token, doc_id, tf, dlen[, poss])
    rows; ``poss`` (list<list<int32>>) flattens one level to list<int32>."""
    docs = t["doc_ids"].combine_chunks()
    offs = np.asarray(docs.offsets, dtype=np.int64)
    lens = np.diff(offs)
    idx = pa.array(np.repeat(np.arange(t.num_rows), lens))
    cols = {"token": t["token"].combine_chunks().take(idx)}
    for list_name, flat_name in _LIST_COLS:
        if list_name in t.column_names:
            cols[flat_name] = t[list_name].combine_chunks().flatten()
    return pa.table(cols)


def _fold_rows(parts: list[pa.Table]) -> pa.Table:
    """Latest-wins fold over (token, doc_id) pairs: ``parts`` in commit
    order, each with a ``rank`` column (0 keep / 1 del / 2 add). Sort
    (token, doc, seq, rank), keep each pair's run-last row unless it is a
    deletion — the lake's last-wins merge, applied to postings."""
    from mex_extractors_ray.stages.dedup import _run_starts

    tagged = []
    for seq, p in enumerate(parts):
        tagged.append(p.append_column(
            "seq", pa.array(np.full(p.num_rows, seq, np.int32))))
    allr = pa.concat_tables(tagged, promote_options="default")
    if allr.num_rows == 0:
        return allr.drop_columns(["rank", "seq"])
    t = allr.sort_by([("token", "ascending"), ("doc_id", "ascending"),
                      ("seq", "ascending"), ("rank", "ascending")])
    pair_start = (_run_starts(t["token"]) | _run_starts(t["doc_id"]))
    starts = np.flatnonzero(pair_start)
    last = np.append(starts[1:], t.num_rows) - 1
    rank = np.asarray(t["rank"].combine_chunks(), dtype=np.int8)
    emit = last[rank[last] != 1]
    return t.take(pa.array(emit)).drop_columns(["rank", "seq"])


def folded_bucket_rows(index_dir: str | Path, bucket: int, meta: dict,
                       terms: list[str] | None = None) -> pa.Table | None:
    """One bucket's LIVE posting rows (token-, then doc-sorted) with every
    COMMITTED segment folded in (latest-wins per pair, deletions drop).
    ``terms`` pushes a token filter into every file read — base and
    segments alike are token-sorted with small row groups, so parquet
    stats prune inside each file. Returns None when nothing exists.

    Segments not listed in the meta are INVISIBLE (the lake's manifest
    discipline: a crashed update's partial segment files never surface)."""
    base = bucket_path(index_dir, bucket)
    filters = [("token", "in", list(terms))] if terms else None
    parts: list[pa.Table] = []
    if base.exists():
        rows = _explode_postings(pq.read_table(base, filters=filters))
        parts.append(rows.append_column(
            "rank", pa.array(np.zeros(rows.num_rows, np.int8))))
    for uid in meta.get("segments", []):
        p = segment_path(index_dir, bucket, uid)
        if p.exists():
            parts.append(pq.read_table(p, filters=filters))
    if not parts:
        return None
    return _fold_rows(parts)


def _rows_to_postings(t: pa.Table) -> pa.Table:
    """Flat pair rows (token-sorted) → list-format posting table."""
    from mex_extractors_ray.stages.dedup import _run_starts

    tok_start = _run_starts(t["token"])
    start_idx = np.flatnonzero(tok_start)
    counts = np.diff(np.append(start_idx, t.num_rows)).astype(np.int64)
    off = pa.array(np.append(start_idx, t.num_rows), pa.int32())

    def _values(col):
        v = t[col].combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.chunk(0) if v.num_chunks else pa.array([], t[col].type)
        return v

    cols = {
        "token": t["token"].combine_chunks().take(pa.array(start_idx)),
        "df": pa.array(counts),
    }
    for list_name, flat_name in _LIST_COLS:
        if flat_name in t.column_names:
            cols[list_name] = pa.ListArray.from_arrays(off, _values(flat_name))
    return pa.table(cols)


def update_token_index(index_dir: str | Path, changes, update_id: str,
                       text_col_old: str = "old_text",
                       text_col_new: str = "new_text",
                       segment: bool = False) -> dict:
    """Incremental index maintenance from a CDC-style change set — the
    indexed analog of the lake's delta apply (`cdc/apply.py`): cost ∝
    buckets touched by the changed docs' old+new vocabulary, never corpus
    size (a full rebuild re-shuffles the whole corpus).

    ``changes`` is a Dataset with columns (doc_id, op, old_text, new_text),
    op ∈ insert/update/delete — the change-log op vocabulary. ``old_text``
    must be the exact text that was indexed (the caller reads it from the
    pre-window state, e.g. an as-of lake read); the equivalence tests
    assert update == full rebuild byte-for-byte.

    Shape: old-side pairs become deletions, new-side pairs additions; ONE
    coarse token-hash shuffle routes both into the affected buckets; each
    bucket rewrite is a vectorized merge — explode existing postings,
    sort (token, doc, rank keep<del<add), keep each pair's run-last row
    unless it is a deletion — written temp+rename. Buckets nobody touched
    are never opened. Idempotent per ``update_id``: bucket merges converge
    on re-run, and the meta delta (n_docs / total_len) is applied once.

    ``segment=True`` is the LSM path — the scale default once windows are
    frequent: instead of read-modify-writing every touched bucket (write
    amplification ∝ bucket bytes; with a Zipfian vocabulary every window
    touches every bucket), the window's delta rows land as per-bucket
    SEGMENT files ``bucket=K.seg-<id>.parquet`` (cost ∝ delta only) that
    reads fold latest-wins (`folded_bucket_rows`) until
    :func:`compact_token_index` folds them into the base — byte-for-byte
    the lake's base-fold + delta-file design, applied to postings.
    Segments commit by appearing in the meta's ``segments`` list, so a
    crashed update's partial files are invisible and a re-run converges.

    Refuses ``max_df`` indexes (a dropped stopword's postings are not
    reconstructible incrementally — rebuild instead)."""
    import re

    from mex_extractors_ray.stages.dedup import _run_starts

    if not re.fullmatch(r"[A-Za-z0-9._-]+", update_id):
        raise ValueError(f"update_id {update_id!r} must be filename-safe")
    index_dir = Path(index_dir)
    meta = load_index_meta(index_dir)
    if meta.get("max_df") is not None:
        raise ValueError(
            "update_token_index: index was built with max_df (dropped "
            "postings are not reconstructible incrementally) — rebuild")
    if (meta.get("last_update_id") == update_id
            or update_id in meta.get("segments", [])):
        return {"noop": True, "update_id": update_id}
    num_buckets, pattern = meta["num_buckets"], meta["pattern"]
    with_pos = bool(meta.get("positions"))

    def delta(t: pa.Table) -> pa.Table:
        op = t["op"]
        is_ins = pc.equal(op, "insert")
        is_del = pc.equal(op, "delete")
        old = pc.if_else(is_ins, pa.nulls(t.num_rows, pa.string()),
                         t[text_col_old])
        new = pc.if_else(is_del, pa.nulls(t.num_rows, pa.string()),
                         t[text_col_new])
        o = _doc_token_stats(pa.table({"doc_id": t["doc_id"], "text": old}),
                             "text", "doc_id", pattern, positions=with_pos)
        nw = _doc_token_stats(pa.table({"doc_id": t["doc_id"], "text": new}),
                              "text", "doc_id", pattern, positions=with_pos)
        o = o.append_column("rank", pa.array(np.ones(o.num_rows, np.int8)))
        nw = nw.append_column("rank", pa.array(np.full(nw.num_rows, 2, np.int8)))
        both = pa.concat_tables([o, nw])
        return both.append_column(
            "_kpart", shard_tags(assign_partitions(both["token"], num_buckets),
                                 num_buckets))

    def apply_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_kpart"])
        if g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "tokens": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.int64())})
        bucket = int(assign_partitions(g["token"].slice(0, 1), num_buckets)[0])
        if segment:
            # LSM path: the delta alone, sorted, as a side segment file —
            # no base read, write cost ∝ this window's pairs
            spath = segment_path(index_dir, bucket, update_id)
            if not spath.exists():
                seg = g.sort_by([("token", "ascending"),
                                 ("doc_id", "ascending"),
                                 ("rank", "ascending")])
                tmp = spath.with_suffix(".parquet.tmp")
                pq.write_table(seg, tmp, row_group_size=_ROW_GROUP_ROWS)
                os.replace(tmp, spath)
            return pa.table({"bucket": [bucket], "tokens": [-1],
                             "postings": [g.num_rows]})
        path = bucket_path(index_dir, bucket)
        parts = [g]
        if path.exists():
            keep = _explode_postings(pq.read_table(path))
            parts.insert(0, keep.append_column(
                "rank", pa.array(np.zeros(keep.num_rows, np.int8))))
        t = _fold_rows(parts)
        if t.num_rows == 0:
            out = pa.table({
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "doc_ids": pa.array([], pa.list_(g["doc_id"].type)),
                "tfs": pa.array([], pa.list_(pa.int64())),
                "dlens": pa.array([], pa.list_(pa.int64())),
            })
        else:
            out = _rows_to_postings(t)
        tmp = path.with_suffix(".parquet.tmp")
        pq.write_table(out, tmp, row_group_size=_ROW_GROUP_ROWS)
        os.replace(tmp, path)
        return pa.table({"bucket": [bucket], "tokens": [out.num_rows],
                         "postings": [int(pc.sum(out["df"]).as_py() or 0)]})

    # meta deltas (n_docs / total token length) — one tiny partial per batch
    def meta_delta(t: pa.Table) -> pa.Table:
        def _dl(col):
            words = pc.split_pattern(pc.fill_null(col, ""), pattern)
            if isinstance(words, pa.ChunkedArray):
                words = words.combine_chunks()
            flat = words.flatten()
            return int(pc.sum(pc.cast(pc.greater(pc.utf8_length(flat), 0),
                                      pa.int64())).as_py() or 0)
        op = t["op"]
        ins = int(pc.sum(pc.cast(pc.equal(op, "insert"), pa.int64())).as_py() or 0)
        dels = int(pc.sum(pc.cast(pc.equal(op, "delete"), pa.int64())).as_py() or 0)
        new_len = _dl(pc.if_else(pc.equal(op, "delete"),
                                 pa.nulls(t.num_rows, pa.string()),
                                 t[text_col_new]))
        old_len = _dl(pc.if_else(pc.equal(op, "insert"),
                                 pa.nulls(t.num_rows, pa.string()),
                                 t[text_col_old]))
        return pa.table({"dd": pa.array([ins - dels], pa.int64()),
                         "dl": pa.array([new_len - old_len], pa.int64())})

    mparts = changes.map_batches(meta_delta, batch_format="pyarrow").take_all()
    dd = sum(r["dd"] for r in mparts)
    dl = sum(r["dl"] for r in mparts)

    tagged = changes.map_batches(delta, batch_format="pyarrow")
    try:
        grouped = tagged.groupby("_kpart", num_partitions=num_buckets)
    except TypeError:
        grouped = tagged.groupby("_kpart")
    report = grouped.map_groups(apply_bucket, batch_format="pyarrow").take_all()

    meta = load_index_meta(index_dir)
    meta["n_docs"] = meta["n_docs"] + dd
    meta["total_len"] = meta["total_len"] + dl
    meta["last_update_id"] = update_id
    if segment:
        # the COMMIT: segments become visible only through this list
        meta["segments"] = meta.get("segments", []) + [update_id]
    meta_tmp = index_dir / (META_NAME + ".tmp")
    meta_tmp.write_text(json.dumps(meta))
    os.replace(meta_tmp, index_dir / META_NAME)
    return {"noop": False, "update_id": update_id, "segment": segment,
            "buckets_touched": len({r["bucket"] for r in report}),
            "n_docs_delta": dd, "total_len_delta": dl}


def compact_token_index(index_dir: str | Path) -> dict:
    """Fold every committed segment into the bucket bases and clear the
    segment list — the index's ``compact_partition``. Idempotent: folding
    is latest-wins per pair, so re-applying an already-folded segment is a
    no-op and a crashed compaction converges on re-run; segment FILES are
    unlinked only after the meta flip (orphans are invisible to readers).
    Distributed one task per bucket."""
    import ray.data

    index_dir = Path(index_dir)
    meta = load_index_meta(index_dir)
    segs = meta.get("segments", [])
    if not segs:
        return {"noop": True, "buckets": 0}
    buckets = sorted({
        int(p.name.split("=")[1].split(".")[0])
        for p in index_dir.glob("bucket=*.parquet")
    } | {
        int(p.name.split("=")[1].split(".")[0])
        for p in index_dir.glob("bucket=*.seg-*.parquet")
    })

    def fold(batch: dict) -> pa.Table:
        done = []
        for b in batch["item"]:
            b = int(b)
            rows = folded_bucket_rows(index_dir, b, meta)
            if rows is None:
                continue
            out = _rows_to_postings(rows)
            path = bucket_path(index_dir, b)
            tmp = path.with_suffix(".parquet.tmp")
            pq.write_table(out, tmp, row_group_size=_ROW_GROUP_ROWS)
            os.replace(tmp, path)
            done.append(b)
        return pa.table({"bucket": pa.array(done, pa.int64())})

    folded = ray.data.from_items(buckets).map_batches(
        fold, batch_size=1, batch_format="numpy").take_all()

    meta = load_index_meta(index_dir)
    meta["segments"] = []
    meta_tmp = index_dir / (META_NAME + ".tmp")
    meta_tmp.write_text(json.dumps(meta))
    os.replace(meta_tmp, index_dir / META_NAME)
    for uid in segs:                       # after the flip: orphans invisible
        for b in buckets:
            segment_path(index_dir, b, uid).unlink(missing_ok=True)
    return {"noop": False, "buckets": len(folded), "segments_folded": len(segs)}


def phrase_lookup(index_dir: str | Path,
                  phrase: tuple[str, ...] | list[str]) -> pa.Table:
    """doc_ids containing the exact token PHRASE (terms at consecutive
    positions, in order) — requires a ``positions=True`` index. Routed
    point reads of the phrase terms' postings (position lists travel with
    the posting); candidate docs = the terms' posting intersection, then
    adjacency by positional intersection walked left-to-right (cost ∝ the
    rarest term's postings — candidates shrink monotonically). Works
    through committed segments via the same latest-wins fold as every
    other reader."""
    phrase = list(phrase)
    if len(phrase) < 2:
        raise ValueError("phrase_lookup: need at least 2 terms (use "
                         "lookup_token_docs for single terms)")
    meta = load_index_meta(index_dir)
    if not meta.get("positions"):
        raise ValueError(
            f"index at {index_dir} was built without positions=True; "
            "rebuild with positions to run phrase queries")
    dropped = set(meta.get("dropped_tokens", []))
    hit = dropped.intersection(phrase)
    if hit:
        raise ValueError(
            f"terms {sorted(hit)} were dropped at build time (df > "
            f"{meta['max_df']}); rebuild without max_df to index them")
    uniq = list(dict.fromkeys(phrase))
    buckets: dict[int, list[str]] = {}
    parts = assign_partitions(pa.array(uniq, pa.string()),
                              meta["num_buckets"])
    for term, bk in zip(uniq, parts):
        buckets.setdefault(int(bk), []).append(term)
    pos: dict[str, dict] = {}
    id_type = pa.int64()
    for bk, bterms in sorted(buckets.items()):
        t = _term_postings(index_dir, meta, bk, bterms)
        if t is None:
            continue
        id_type = t["doc_ids"].type.value_type
        docs_l = t["doc_ids"].combine_chunks()
        poss_l = t["poss"].combine_chunks()
        for i, tok in enumerate(t["token"].to_pylist()):
            docs = docs_l[i].values.to_numpy(zero_copy_only=False)
            plists = poss_l[i]
            pos[tok] = {
                int(d): np.asarray(plists[j].as_py(), dtype=np.int64)
                for j, d in enumerate(docs)
            }
    if any(tok not in pos for tok in uniq):
        return pa.table({"doc_id": pa.array([], id_type)})
    # candidates: intersect doc sets smallest-first
    doc_sets = sorted((set(pos[tok]) for tok in uniq), key=len)
    cands = sorted(set.intersection(*doc_sets))
    out = []
    for d in cands:
        cur = pos[phrase[0]][d]
        for tok in phrase[1:]:
            cur = np.intersect1d(cur + 1, pos[tok][d])
            if not len(cur):
                break
        else:
            out.append(d)
    return pa.table({"doc_id": pa.array(out, pa.int64()).cast(id_type)})


def proximity_lookup(index_dir: str | Path, term_a: str, term_b: str,
                     max_dist: int) -> pa.Table:
    """doc_ids where ``term_a`` and ``term_b`` occur within ``max_dist``
    token positions of each other (either order) — the WITHIN-k operator.
    Same routed-read + positional machinery as :func:`phrase_lookup`;
    the per-candidate check is a sorted-merge nearest-distance probe
    (searchsorted), cost ∝ the rarer term's postings."""
    if max_dist < 1:
        raise ValueError("proximity_lookup: max_dist must be >= 1")
    meta = load_index_meta(index_dir)
    if not meta.get("positions"):
        raise ValueError(
            f"index at {index_dir} was built without positions=True; "
            "rebuild with positions to run proximity queries")
    uniq = list(dict.fromkeys([term_a, term_b]))
    buckets: dict[int, list[str]] = {}
    parts = assign_partitions(pa.array(uniq, pa.string()), meta["num_buckets"])
    for term, bk in zip(uniq, parts):
        buckets.setdefault(int(bk), []).append(term)
    pos: dict[str, dict] = {}
    id_type = pa.int64()
    for bk, bterms in sorted(buckets.items()):
        t = _term_postings(index_dir, meta, bk, bterms)
        if t is None:
            continue
        id_type = t["doc_ids"].type.value_type
        docs_l = t["doc_ids"].combine_chunks()
        poss_l = t["poss"].combine_chunks()
        for i, tok in enumerate(t["token"].to_pylist()):
            docs = docs_l[i].values.to_numpy(zero_copy_only=False)
            plists = poss_l[i]
            pos[tok] = {
                int(d): np.asarray(plists[j].as_py(), dtype=np.int64)
                for j, d in enumerate(docs)
            }
    if term_a not in pos or term_b not in pos:
        return pa.table({"doc_id": pa.array([], id_type)})
    if term_a == term_b:
        # same term: needs two occurrences within max_dist — adjacent
        # sorted positions give the minimum gap
        out = [d for d, p in pos[term_a].items()
               if len(p) > 1 and int(np.min(np.diff(p))) <= max_dist]
        return pa.table({"doc_id": pa.array(sorted(out), pa.int64()).cast(id_type)})
    pa_, pb_ = pos[term_a], pos[term_b]
    cands = sorted(set(pa_) & set(pb_))
    out = []
    for d in cands:
        p1, p2 = pa_[d], pb_[d]
        # nearest p2 around each p1 via one searchsorted pass
        j = np.searchsorted(p2, p1)
        left = np.where(j > 0, np.abs(p1 - p2[np.maximum(j - 1, 0)]),
                        np.iinfo(np.int64).max)
        right = np.where(j < len(p2), np.abs(p2[np.minimum(j, len(p2) - 1)] - p1),
                         np.iinfo(np.int64).max)
        if int(np.minimum(left, right).min()) <= max_dist:
            out.append(d)
    return pa.table({"doc_id": pa.array(out, pa.int64()).cast(id_type)})


def bm25_topk(index_dir: str | Path, terms: tuple[str, ...] | list[str],
              k: int = 10, k1: float = 1.25, b: float = 0.75) -> pa.Table:
    """BM25-ranked top-k docs for a multi-term query, served ENTIRELY from
    the routed posting reads — tf and dlen travel with each posting, N and
    avgdl come from the build meta, so cost ∝ postings of the query terms,
    never corpus size (the reference re-scans records per query,
    ``mex/extractors/ff_projects/filter.py``; this is the indexed form).

    Scoring uses the log-free rational idf ``(N − df + ½)/(df + ½)`` —
    ln-idf's argument without the (monotone) log, so rankings for a given
    df are order-compatible — and emits per-doc

        score_c6 = Σ_t floor(1e6·idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) + ½)

    as exact int64 (the ``tfidf_top_terms`` integer-score discipline:
    every float op is a fixed-order IEEE +,−,×,÷ chain, so a SQL oracle
    spelling the same expression hash-matches bit-for-bit; the defaults
    k1=1.25, b=0.75 are exact binary doubles for literal-parsing parity).
    Ties break by ascending doc id. Duplicate query terms are deduped."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("bm25_topk: empty term list")
    meta = load_index_meta(index_dir)
    if "n_docs" not in meta:
        raise ValueError(
            f"index at {index_dir} predates corpus stats; rebuild to use bm25_topk")
    dropped = set(meta.get("dropped_tokens", []))
    hit = dropped.intersection(terms)
    if hit:
        raise ValueError(
            f"terms {sorted(hit)} were dropped at build time (df > "
            f"{meta['max_df']}); rebuild without max_df to score them")
    n_docs = float(meta["n_docs"])
    avgdl = float(meta["total_len"]) / float(meta["n_docs"])
    buckets: dict[int, list[str]] = {}
    parts = assign_partitions(pa.array(terms, pa.string()), meta["num_buckets"])
    for term, bk in zip(terms, parts):
        buckets.setdefault(int(bk), []).append(term)
    doc_chunks: list[np.ndarray] = []
    sc_chunks: list[np.ndarray] = []
    id_type = pa.int64()
    for bk, bterms in sorted(buckets.items()):
        t = _term_postings(index_dir, meta, bk, bterms)
        if t is None:
            continue
        id_type = t["doc_ids"].type.value_type
        dfs = t["df"].to_pylist()
        docs_l = t["doc_ids"].combine_chunks()
        tfs_l = t["tfs"].combine_chunks()
        dlens_l = t["dlens"].combine_chunks()
        for i in range(t.num_rows):
            df = float(dfs[i])
            docs = np.asarray(docs_l[i].values.to_numpy(zero_copy_only=False))
            tf = np.asarray(tfs_l[i].values.to_numpy(zero_copy_only=False),
                            dtype=np.float64)
            dl = np.asarray(dlens_l[i].values.to_numpy(zero_copy_only=False),
                            dtype=np.float64)
            idf = (n_docs - df + 0.5) / (df + 0.5)
            sc = np.floor(
                1e6 * (idf * ((tf * (k1 + 1.0))
                              / (tf + k1 * (1.0 - b + (b * dl) / avgdl))))
                + 0.5).astype(np.int64)
            doc_chunks.append(docs)
            sc_chunks.append(sc)
    if not doc_chunks:
        return pa.table({"doc_id": pa.array([], id_type),
                         "score_c6": pa.array([], pa.int64())})
    all_docs = np.concatenate(doc_chunks)
    all_sc = np.concatenate(sc_chunks)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(acc, inv, all_sc)
    order = np.lexsort((uniq, -acc))[:k]
    return pa.table({"doc_id": pa.array(uniq[order]).cast(id_type),
                     "score_c6": pa.array(acc[order])})
