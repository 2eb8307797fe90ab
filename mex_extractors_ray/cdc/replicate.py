"""Lake-to-lake replication: keep a replica lake equal to a source lake by
shipping the source's CHANGE FEED, not its data files.

The reference re-extracts every source system in full on every run
(``mex/extractors/pipeline/base.py:51-105`` — the run-timestamp sensor
re-materializes everything); at lake scale a downstream copy must instead
consume changes ∝ lag. This module composes two existing primitives:

- :func:`~mex_extractors_ray.cdc.apply.read_changes` — the source's
  manifest-pruned change feed (bytes read ∝ lag, never lake size), and
- :func:`~mex_extractors_ray.cdc.apply.ingest_change_log` — the replica is
  a FIRST-CLASS lake written through the standard exactly-once apply, so
  point lookups, filtered reads, exports and further replication all work
  on it, and re-delivered changes are dropped idempotently by the
  per-partition watermarks.

The replica may use a DIFFERENT partition count than the source (replica
re-sharding: a read-optimized copy at higher P is one call).

Consistency under a concurrently-ingesting source: the bootstrap snapshot
is not atomic across partitions (readers take no lease), so a partition
read mid-ingest may already contain rows above the recorded watermark.
The bootstrap therefore CUTS the snapshot at the watermark it recorded
before reading (rows with lsn > src_wm are excluded): every replica
partition's own watermark stays ≤ src_wm, the next incremental pass
(since = src_wm) re-delivers everything concurrent, and convergence holds
at every replicate() return that observed a quiescent source. (Without
the cut, a replica partition MIXING early- and late-read source
partitions — resharded replicas — would watermark past changes the early
reads missed and drop their re-delivery as late, permanently.)

Identity: ``_replica.json`` records the source path and the replicated
watermark. Replicating a DIFFERENT source into the same replica raises —
two feeds interleaved into one lake would fork doc histories silently.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pyarrow as pa

from mex_extractors_ray.cdc.apply import (
    ingest_change_log,
    lake_num_partitions,
    read_changes,
    read_lake,
)
from mex_extractors_ray.cdc.manifest import atomic_write_bytes
from mex_extractors_ray.pipelines.incremental_export import (
    _lake_feed_floor,
    lake_high_watermark,
)
from mex_extractors_ray.schema import SchemaRegistry, sequence_registry

_MARKER = "_replica.json"


def read_replica_state(dst_dir: str | Path) -> dict | None:
    try:
        return json.loads((Path(dst_dir) / _MARKER).read_text())
    except FileNotFoundError:
        return None


def _tag_op(t: pa.Table, op: str) -> pa.Table:
    return t.append_column("op", pa.array([op] * t.num_rows, pa.string()))


# single canonicalizer + inherit sentinel live with the predicate grammar
from mex_extractors_ray.cdc.filtered import INHERIT as _INHERIT
from mex_extractors_ray.cdc.filtered import canon_where as _canon_where


def _face_predicate(preds):
    """Feed transform for a FILTERED replica: an upsert whose new version
    fails the predicate becomes a DELETE (the updated-out-of-view
    retraction), deletes pass through, in-view upserts pass through."""
    import pyarrow.compute as pc

    from mex_extractors_ray.cdc.filtered import _CMP

    def fn(t: pa.Table, _preds=tuple(tuple(p) for p in preds)) -> pa.Table:
        in_view = None
        for c, o, v in _preds:
            m = (pc.is_in(t[c], value_set=pa.array(list(v))) if o == "in"
                 else _CMP[o](t[c], v))
            m = pc.fill_null(m, False)
            in_view = m if in_view is None else pc.and_(in_view, m)
        op = pc.if_else(in_view, t["op"],
                        pa.scalar("delete", pa.string()))
        return t.set_column(t.column_names.index("op"), "op", op)

    return fn


def _apply_transform(transform):
    """Feed stage for a TRANSFORM view: upserts go through the user's
    row-wise transform (presented without ``op``; must return exactly one
    output row per input row — dropping rows would leave stale view
    versions, that is ``where``'s job), deletes are reshaped to the
    transformed schema (payload irrelevant — retraction is by doc_id)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        is_del = pc.equal(t["op"], "delete")
        dels = t.filter(is_del)
        ups = t.filter(pc.invert(is_del))
        out = transform(ups.drop_columns(["op"]))
        if out.num_rows != ups.num_rows:
            raise ValueError(
                f"transform returned {out.num_rows} rows for {ups.num_rows} "
                "upserts; transforms must be row-wise (use where= to filter)")
        for req in ("doc_id", "lsn"):
            if req not in out.column_names:
                raise ValueError(
                    f"transform dropped the {req!r} column; transforms must "
                    "preserve doc_id and lsn (retraction and idempotence "
                    "key on them)")
        pieces = [out.append_column("op", pa.array(["upsert"] * out.num_rows,
                                                   pa.string()))]
        if dels.num_rows:
            # reshape deletes to the TRANSFORMED schema exactly (a transform
            # may retype a column it keeps the name of — reusing dels'
            # source-typed columns would make concat_tables raise): only the
            # retraction keys survive, cast to the output's types; every
            # payload column is null (irrelevant — retraction is by doc_id)
            cols = {
                fld.name: (dels[fld.name].cast(fld.type)
                           if fld.name in ("doc_id", "lsn")
                           else pa.nulls(dels.num_rows, fld.type))
                for fld in out.schema
            }
            cols["op"] = dels["op"]
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]

    return fn


def replicate_lake(src_dir: str | Path, dst_dir: str | Path, *,
                   num_partitions: int | None = None,
                   where: list | None | object = _INHERIT,
                   transform=None, transform_id: str | None = None,
                   dst_registry: SchemaRegistry | None = None,
                   registry: SchemaRegistry | None = None) -> dict:
    """Bring the replica at ``dst_dir`` current with ``src_dir``; returns
    the replica marker. Three regimes, decided from metadata alone:

    - **noop**: replica watermark == source watermark (nothing read).
    - **incremental**: the source feed since the replica's watermark is
      ingested (bytes ∝ lag, manifest-pruned at the source).
    - **bootstrap / rebase**: no marker yet, or the replica's watermark has
      fallen below the source's change-feed floor (a fold squashed the
      history the replica still needs). The replica is rebuilt from the
      source's LIVE state (op=insert at each row's own lsn) — a derived
      artifact, so the wipe loses nothing; deletes below the watermark are
      already reflected as absence.

    ``where`` (conjunctive ``[(col, op, value), ...]``, the ``cdc.filtered``
    grammar) makes this a FILTERED REPLICA — a maintained-view LAKE holding
    exactly the source rows that pass the predicate. Maintenance: an upsert
    whose new version fails the predicate ships as a DELETE (the doc may
    never have been in view — the spurious tombstone is correct, just
    debt), so updated-out-of-view docs retract and updated-into-view docs
    appear. The bootstrap reads through the pushdown filtered reader.
    Tombstone debt from out-of-view churn grows with the feed, not the
    corpus, and a rebase (which re-bootstraps from filtered live state)
    clears it. Like the export, the filter is part of the replica's
    IDENTITY: marker-recorded, inherited when unspecified, refused on
    explicit mismatch (per-window filters would silently mix views).

    ``transform`` (with a mandatory ``transform_id``) makes this a
    MAINTAINED TRANSFORM VIEW (select-project incremental view
    maintenance): a PURE ROW-WISE function ``pa.Table -> pa.Table`` applied
    to every upsert (source lake schema, ``doc_id``/``lsn`` preserved,
    exactly one output row per input row); composed AFTER ``where``. The
    view row for a doc is a pure function of its source row, so the
    retract-by-key discipline maintains it for free. A transform that adds
    or reshapes columns needs ``dst_registry`` describing the view's
    schema. Identity: ``transform_id`` is marker-recorded; a follow-on pass
    must present the SAME id together with the callable (the callable
    cannot be reconstructed from the marker), and a bare pass on a
    transform view raises rather than silently writing untransformed rows.
    """
    src, dst = Path(src_dir), Path(dst_dir)
    registry = registry or sequence_registry()
    state = read_replica_state(dst)
    if state is None and (dst / "_lake_meta.json").exists():
        # a lake with no replica marker was NOT written by the replicator —
        # the rebase below wipes dst, so refusing here prevents destroying
        # an unrelated lake a caller pointed at by mistake
        raise ValueError(
            f"{dst} is an existing lake with no _replica.json; refusing to "
            "overwrite it — pick a fresh replica dir.")
    if state is not None and str(state.get("src")) != str(src):
        raise ValueError(
            f"replica at {dst} tracks source {state.get('src')!r}; refusing "
            f"to apply the feed of {str(src)!r} — interleaved feeds would "
            "fork doc histories. Use a fresh replica dir.")
    prev_where = _canon_where((state or {}).get("where"))
    where = prev_where if where is _INHERIT else _canon_where(where)
    if where:
        from mex_extractors_ray.cdc.filtered import _check_predicate

        for c, o, _ in where:
            _check_predicate(registry, c, o)
    if (transform is None) != (transform_id is None):
        raise ValueError("transform and transform_id must be given together "
                         "(the id is the view's marker identity)")
    prev_tid = (state or {}).get("transform_id")
    if state is not None and prev_tid != transform_id:
        raise ValueError(
            f"replica at {dst} is a transform view with id {prev_tid!r}; "
            f"got {transform_id!r} — a pass without the view's own "
            "transform would write untransformed (or differently "
            "transformed) rows. Pass the same transform + id.")
    dst_registry = dst_registry or registry
    if state is not None and prev_where != where:
        raise ValueError(
            f"replica at {dst} was built with filter {prev_where}; refusing "
            f"a pass with {where} — per-window filters would mix views. "
            "Use a fresh replica dir.")
    if num_partitions is None:
        num_partitions = (int(state["num_partitions"]) if state
                          else lake_num_partitions(src))
    since = int(state["watermark"]) if state else -1
    src_wm = lake_high_watermark(src)
    if state is not None and since == src_wm:
        return {**state, "mode": "noop"}
    if state is not None and since > src_wm:
        # a replica AHEAD of its source means the source was wiped and
        # rebuilt (LSNs restarted): silently no-oping would track a dead
        # history and later splice the new feed onto the old state — the
        # same guard the export raises for
        raise ValueError(
            f"replica watermark {since} is AHEAD of the source ({src_wm}) "
            f"— was {src} wiped and rebuilt? Use a fresh replica dir.")

    rebase = state is None or since < _lake_feed_floor(src)
    if rebase:
        # derived artifact: wiping loses nothing, and a partial previous
        # replica must not survive (its extra docs would linger forever);
        # a rebase also clears a filtered replica's tombstone debt
        if dst.exists():
            shutil.rmtree(dst)
        # INTENT marker before the ingest: a crash between the ingest's
        # first manifest commit (which writes _lake_meta.json) and the
        # final marker write would otherwise leave a lake the
        # unrelated-lake guard above refuses forever. watermark=-2 is
        # below every feed floor, so a resume always takes this rebase
        # branch again (wiping the partial bootstrap).
        dst.mkdir(parents=True, exist_ok=True)
        atomic_write_bytes(dst / _MARKER, json.dumps({
            "src": str(src), "watermark": -2,
            "num_partitions": num_partitions, "where": where,
            "transform_id": transform_id,
        }).encode())
        if where:
            from mex_extractors_ray.cdc.filtered import read_lake_filtered

            base = read_lake_filtered(src, [tuple(p) for p in where],
                                      registry=registry)
        else:
            base = read_lake(src, registry)
        # snapshot consistency cut: the per-partition reads are not atomic
        # (readers take no lease), so a source partition read mid-ingest can
        # contribute rows ABOVE src_wm — and a replica partition mixing
        # early- and late-read source partitions (num_partitions != source
        # P) would then set its watermark past changes the early reads
        # missed, making the next incremental pass drop them as late,
        # permanently. Cutting the bootstrap at src_wm caps every replica
        # partition's watermark at src_wm, so the next pass (since=src_wm)
        # re-delivers everything concurrent — idempotent, never a gap.
        import pyarrow.compute as pc

        base = base.map_batches(
            lambda t, _wm=src_wm: t.filter(pc.less_equal(t["lsn"], _wm)),
            batch_format="pyarrow")
        if transform is not None:
            def _checked(t: pa.Table, _tf=transform) -> pa.Table:
                out = _tf(t)
                if out.num_rows != t.num_rows:
                    raise ValueError(
                        f"transform returned {out.num_rows} rows for "
                        f"{t.num_rows}; transforms must be row-wise "
                        "(use where= to filter)")
                return out

            base = base.map_batches(_checked, batch_format="pyarrow")
        feed = base.map_batches(
            lambda t, _op="insert": _tag_op(t, _op), batch_format="pyarrow")
    else:
        feed = read_changes(src, since, registry)  # rows already carry op
        if where:
            feed = feed.map_batches(_face_predicate(where),
                                    batch_format="pyarrow")
        if transform is not None:
            feed = feed.map_batches(_apply_transform(transform),
                                    batch_format="pyarrow")

    ingest_change_log(feed, dst, num_partitions=num_partitions,
                      registry=dst_registry)
    state = {
        "src": str(src),
        "watermark": src_wm,
        "num_partitions": num_partitions,
        "where": where,
        "transform_id": transform_id,
        "mode": "bootstrap" if rebase else "incremental",
    }
    # marker AFTER the ingest's last manifest commit: a crash in between
    # re-ships from the old watermark and the apply drops the re-delivered
    # windows as late — idempotent resume, never a gap
    atomic_write_bytes(dst / _MARKER, json.dumps(
        {k: v for k, v in state.items() if k != "mode"}).encode())
    return state
