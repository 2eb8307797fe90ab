"""Anti-entropy replica REPAIR: converge a drifted replica to a source
lake by applying only the true difference through the normal CDC path.

The reference reconciles divergent states by full re-extraction and
re-posting everything to the backend (its sync jobs); at lake scale the
economics must be ∝ divergence, never lake size:

- :func:`mex_extractors_ray.cdc.diff.diff_lakes` names the differing docs
  WITHOUT shipping payloads (one doc-hash shuffle, output bounded by the
  true difference) — called here with ``lsn`` INCLUDED in the payload
  hash, because repair's contract is byte-identity: a doc whose content
  matches but whose winner lsn differs must still be fixed;
- only those docs' payloads are then read back from the SOURCE lake
  (the tokens column leaves disk for repaired docs only);
- the fix lands as ordinary change events through
  :func:`mex_extractors_ray.cdc.apply.ingest_change_log` — same shuffle,
  same per-partition merge, same manifest commit, same idempotency: a
  crashed repair re-runs to the identical state, and repairing an
  already-converged replica is a no-op (empty diff ⇒ zero events).

LSN discipline: upserts carry the SOURCE row's own lsn and deletes carry
the source watermark, so after repair the replica's (doc_id → lsn) map
equals the source's. Preserving lsns requires every fix lsn to clear the
replica's watermark — true for the anti-entropy cases this op exists for
(stale replica, prefix drift, lost windows); the guard below REFUSES
(rather than letting the apply drop the fix as a late event) when it
doesn't hold. For a forward-diverged replica (rogue local writes with
lsns past the source's), ``bump_lsn=True`` mints fresh lsns above both
watermarks: content converges, the lsn column intentionally differs.

Above ``broadcast_ceiling`` differing docs, per-doc repair is the wrong
tool economically (the fix set no longer fits one broadcast object and
approaches a re-copy): use ``replicate``'s bootstrap path, which streams
partition files wholesale. The ceiling raises a clear error instead of
silently degrading.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def repair_replica(src_lake: str | Path, dst_lake: str | Path,
                   bump_lsn: bool = False,
                   broadcast_ceiling: int = 2_000_000) -> dict:
    """Make ``dst_lake``'s live state equal ``src_lake``'s (including each
    row's winner lsn unless ``bump_lsn``). Returns stats:
    ``{"upserts", "deletes", "bumped", "metrics"}`` (metrics = the ingest's
    per-partition table, or None when the diff was empty)."""
    import ray
    import ray.data

    from mex_extractors_ray.cdc.apply import (
        _manifested_pids, ingest_change_log, lake_num_partitions, read_lake,
        read_manifest,
    )
    from mex_extractors_ray.cdc.diff import diff_lakes
    from mex_extractors_ray.schema import sequence_registry

    registry = sequence_registry()
    latest_v = registry.latest_version
    payload_cols = [f.name for f in registry.latest.to_arrow()
                    if f.name != "doc_id"] + ["lsn"]

    # diff(old=dst, new=src): "added"/"changed" ⇒ upsert from src,
    # "removed" ⇒ the doc lives only on dst ⇒ delete there
    d = diff_lakes(dst_lake, src_lake, payload_cols=payload_cols).materialize()
    n_diff = d.count()
    if n_diff == 0:
        return {"upserts": 0, "deletes": 0, "bumped": 0, "metrics": None}
    if n_diff > broadcast_ceiling:
        raise ValueError(
            f"repair_replica: {n_diff} differing docs exceeds the broadcast "
            f"ceiling ({broadcast_ceiling}); at this divergence a bootstrap "
            "re-copy (cdc.replicate) is cheaper than per-doc repair")

    # drop the zero-column placeholder blocks a union of empty inputs can
    # leave behind before concatenating
    blocks = [t for t in ray.get(d.to_arrow_refs()) if t.num_columns]
    diff_t = pa.concat_tables(blocks)
    up_mask = pc.is_in(diff_t["status"],
                       value_set=pa.array(["added", "changed"]))
    upsert_ids = diff_t["doc_id"].filter(up_mask).combine_chunks()
    delete_ids = diff_t["doc_id"].filter(
        pc.equal(diff_t["status"], "removed")).combine_chunks()

    def watermark(lake) -> int:
        return max((read_manifest(lake, pid).last_lsn
                    for pid in _manifested_pids(lake)), default=0)

    w_src, w_dst = watermark(src_lake), watermark(dst_lake)

    # upsert events: the differing docs' full rows, read back from the
    # source; the filter runs inside the partition-local merged read
    up_ref = ray.put(upsert_ids)

    def to_events(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.is_in(t["doc_id"], value_set=ray.get(up_ref)))
        return pa.table({
            "lsn": keep["lsn"],
            "op": pa.array(["update"] * keep.num_rows),
            "doc_id": keep["doc_id"],
            "tokens": keep["tokens"],
            "n_tok": keep["n_tok"],
            "source": keep["source"],
            "schema_version": pa.array(
                np.full(keep.num_rows, latest_v, np.int32)),
            "lang": keep["lang"],
        })

    parts = [t for t in ray.get(
        read_lake(src_lake).map_batches(to_events, batch_format="pyarrow")
        .to_arrow_refs())]
    ev_t = pa.concat_tables([t for t in parts if t.num_rows] or parts[:1])
    if len(delete_ids):
        dels = pa.table({
            "lsn": pa.array(np.full(len(delete_ids), w_src, np.int64)),
            "op": pa.array(["delete"] * len(delete_ids)),
            "doc_id": delete_ids,
            "tokens": pa.nulls(len(delete_ids), pa.list_(pa.int32())),
            "n_tok": pa.nulls(len(delete_ids), pa.int64()),
            "source": pa.nulls(len(delete_ids), pa.string()),
            "schema_version": pa.array(
                np.full(len(delete_ids), latest_v, np.int32)),
            "lang": pa.nulls(len(delete_ids), pa.string()),
        })
        ev_t = pa.concat_tables([ev_t, dels.cast(ev_t.schema)])

    # the event set is bounded by the diff (≤ broadcast_ceiling rows), so
    # the lsn guard / bump can run driver-side without scale risk
    bumped = 0
    if bump_lsn:
        ev_t = ev_t.sort_by([("doc_id", "ascending")])
        base = max(w_src, w_dst)
        ev_t = ev_t.set_column(
            0, "lsn",
            pa.array(base + 1 + np.arange(ev_t.num_rows, dtype=np.int64)))
        bumped = ev_t.num_rows
    elif ev_t.num_rows:
        min_fix = int(pc.min(ev_t["lsn"]).as_py())
        if min_fix <= w_dst:
            raise ValueError(
                f"repair_replica: fix lsn {min_fix} does not clear the "
                f"replica watermark {w_dst}; preserved source lsns would be "
                "dropped as late events — pass bump_lsn=True (content-"
                "converging) or re-bootstrap via cdc.replicate")

    metrics = ingest_change_log(
        ray.data.from_arrow(ev_t), dst_lake,
        num_partitions=lake_num_partitions(dst_lake))
    return {"upserts": len(upsert_ids), "deletes": len(delete_ids),
            "bumped": bumped, "metrics": metrics}
