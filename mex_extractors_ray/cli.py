"""CLI drivers — the ``@entrypoint()``-per-pipeline analog
(``mex/extractors/main.py:5-8``), submitted standalone or via
``ray job submit``. These OWN a Ray session (guarded init + shutdown);
library code never does.

    python -m mex_extractors_ray.cli ingest  --log DIR --lake DIR [-p N]
    python -m mex_extractors_ray.cli gen     --out DIR --events N --docs N
    python -m mex_extractors_ray.cli replay  --log DIR --lake DIR   (oracle diff)
    python -m mex_extractors_ray.cli verify  --lake DIR             (audit)
    python -m mex_extractors_ray.cli compact --lake DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

# force glibc heap reuse (see bench.py): without this, steady-state large
# allocations pay this sandbox's first-touch fault cost on every buffer
_TUNABLES = {"MALLOC_MMAP_THRESHOLD_": "2147483648", "MALLOC_TRIM_THRESHOLD_": "2147483648"}
if (
    __name__ == "__main__"
    and os.environ.get("MALLOC_MMAP_THRESHOLD_") != _TUNABLES["MALLOC_MMAP_THRESHOLD_"]
):
    os.environ.update(_TUNABLES)
    os.execv(sys.executable, [sys.executable, "-m", "mex_extractors_ray.cli"] + sys.argv[1:])


def _ray():
    import ray

    if not ray.is_initialized():
        # under `ray job submit` the cluster address from the job env wins;
        # standalone (no MEX_RAY_ADDRESS/RAY_JOB_ID) we pin local mode with
        # a bounded CPU count so benches and tests are reproducible
        if os.environ.get("RAY_JOB_ID") or os.environ.get("MEX_RAY_ADDRESS"):
            ray.init(address=os.environ.get("MEX_RAY_ADDRESS", "auto"),
                     logging_level="ERROR")
        else:
            ray.init(
                address="local",
                num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                include_dashboard=False,
                logging_level="ERROR",
            )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from mex_extractors_ray.runtime import silence_empty_block_schema_warnings

    silence_empty_block_schema_warnings()
    return ray


def _log_paths(log: str) -> list[str]:
    p = Path(log)
    return sorted(str(f) for f in p.glob("*.parquet")) if p.is_dir() else [log]


def cmd_gen(args) -> int:
    from mex_extractors_ray.gen import synth_change_log

    paths = synth_change_log(args.out, n_events=args.events, n_docs=args.docs, seed=args.seed)
    print(json.dumps({"files": len(paths), "out": args.out}))
    return 0


def cmd_ingest(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc import ingest_change_log
    from mex_extractors_ray.state.checks import append_lineage, evaluate_checks

    import pyarrow.compute as pc

    constraints = None
    if args.constraints:
        p = Path(args.constraints)
        if p.suffix in (".yaml", ".yml"):
            from mex_extractors_ray.config import filter_yaml_to_rules, load_yaml

            constraints = filter_yaml_to_rules(load_yaml(p))
        else:
            constraints = json.loads(p.read_text())
    metrics = ingest_change_log(
        _log_paths(args.log), args.lake, num_partitions=args.partitions,
        mode=args.apply_mode,
        constraints=constraints,
        rejects_out=args.rejects_out or None,
        delta=not args.no_delta, compact_threshold=args.compact_threshold,
        # empty flag = inherit the lake's established view (None), never an
        # implicit drop; `--track-counts ""` has no way to request a drop —
        # that is deliberate (dropping a view is an API-level decision)
        track_value_counts=tuple(args.track_counts.split(",")) if args.track_counts else None,
        track_bounds=tuple(args.track_bounds.split(",")) if args.track_bounds else None,
    )
    run_id = f"{int(pc.max(metrics['last_lsn']).as_py() or 0):020d}"
    append_lineage(args.lake, metrics, run_id=run_id)
    violations = evaluate_checks(args.lake, json.loads(args.checks)) if args.checks else []
    print(
        json.dumps(
            {
                "partitions": metrics.num_rows,
                "rows_in": int(pc.sum(metrics["rows_in"]).as_py() or 0),
                "upserts": int(pc.sum(metrics["upserts"]).as_py() or 0),
                "deletes": int(pc.sum(metrics["deletes"]).as_py() or 0),
                "late_dropped": int(pc.sum(metrics["late_dropped"]).as_py() or 0),
                "row_count": int(pc.sum(metrics["row_count"]).as_py() or 0),
                "check_violations": violations,
            }
        )
    )
    ray.shutdown()
    return 1 if violations else 0


def cmd_replay(args) -> int:
    """Single-process oracle replay + byte-compare against the lake."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mex_extractors_ray.cdc import replay_reference
    from mex_extractors_ray.cdc.apply import read_lake_arrow

    log = pa.concat_tables(pq.read_table(p) for p in _log_paths(args.log))
    expected, tombs = replay_reference(log)
    lake = read_lake_arrow(args.lake)
    identical = lake.equals(expected)
    print(
        json.dumps(
            {
                "identical": identical,
                "lake_rows": lake.num_rows,
                "expected_rows": expected.num_rows,
                "tombstones": len(tombs),
            }
        )
    )
    return 0 if identical else 1


def cmd_verify(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.compact import verify_lake

    reports = verify_lake(args.lake)
    bad = [r for r in reports if not r["ok"]]
    print(json.dumps({"partitions": len(reports), "failed": bad}))
    ray.shutdown()
    return 1 if bad else 0


def cmd_tail(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.tail import tail_loop

    tail_loop(
        args.log, args.lake, poll_seconds=args.poll,
        max_polls=args.max_polls, num_partitions=args.partitions,
        export_out=args.export_out, replica_out=args.replica_out,
        split_rows_over=args.split_rows_over,
        split_bytes_over=args.split_bytes_over,
        mode=args.apply_mode,
    )
    ray.shutdown()
    return 0


def cmd_repartition(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.compact import repartition_lake

    out = repartition_lake(args.lake, args.partitions)
    print(json.dumps(out))
    ray.shutdown()
    return 0


def cmd_split(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.compact import split_hot_partitions, split_partition

    if args.pid is not None:
        out = split_partition(args.lake, args.pid, force=args.force)
    else:
        if args.rows_over is None and args.bytes_over is None:
            raise SystemExit("give --pid, or --rows-over/--bytes-over for the policy")
        out = split_hot_partitions(
            args.lake, max_rows=args.rows_over, max_bytes=args.bytes_over,
            force=args.force, dry_run=args.dry_run)
    print(json.dumps(out))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.compact import compact

    out = compact(args.lake, cluster_by=args.cluster_by,
                  row_group_rows=args.row_group_rows)
    actions = {}
    for r in out:
        actions[r["action"]] = actions.get(r["action"], 0) + 1
    print(json.dumps({"partitions": len(out), "actions": actions}))
    ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    # pure metadata — no Ray session needed
    from mex_extractors_ray.cdc.compact import lake_stats

    print(json.dumps(lake_stats(args.lake)))
    return 0


def cmd_delete(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.filtered import delete_where

    preds = [_parse_where(w) for w in args.where]
    print(json.dumps(delete_where(args.lake, preds)))
    ray.shutdown()
    return 0


def cmd_vacuum(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.compact import vacuum_lake

    out = vacuum_lake(args.lake, dry_run=args.dry_run,
                      retention_seconds=args.retention)
    print(json.dumps({
        "dry_run": out["dry_run"],
        "files_removed": out["files_removed"],
        "bytes_reclaimed": out["bytes_reclaimed"],
    }))
    ray.shutdown()
    return 0


def cmd_counts(args) -> int:
    # manifest-only read: no Ray session needed
    from mex_extractors_ray.cdc.apply import (
        read_live_group_sums,
        read_live_value_counts,
    )

    if args.sum:
        t = read_live_group_sums(args.lake, args.column, args.sum)
        print(json.dumps({
            "column": args.column, "sum": args.sum,
            "groups": {
                k: {"n": n, f"sum_{args.sum}": s}
                for k, n, s in zip(t[args.column].to_pylist(),
                                   t["n"].to_pylist(),
                                   t[f"sum_{args.sum}"].to_pylist())
            },
        }))
    else:
        t = read_live_value_counts(args.lake, args.column)
        print(json.dumps({
            "column": args.column,
            "counts": dict(zip(t[args.column].to_pylist(), t["n"].to_pylist())),
        }))
    return 0


def cmd_asof(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.apply import read_lake_asof

    ds = read_lake_asof(args.lake, args.lsn)
    if args.out:
        ds.write_parquet(args.out)
        ds = read_lake_asof(args.lake, args.lsn)  # count on a fresh plan
    print(json.dumps({"lsn": args.lsn, "rows": ds.count(), "out": args.out}))
    ray.shutdown()
    return 0


def _parse_where(spec: str) -> tuple[str, str, object]:
    """'col<op>value' → (col, op, typed value). Ops: == != <= >= < > and
    'col in a,b,c'. Integer-looking values are compared as ints."""
    import re

    m = re.match(r"^\s*(\w+)\s+in\s+(.+)$", spec)
    if m:
        vals = [v.strip() for v in m.group(2).split(",")]
        typed = [int(v) if re.fullmatch(r"-?\d+", v) else v for v in vals]
        return m.group(1), "in", typed
    m = re.match(r"^\s*(\w+)\s*(==|!=|<=|>=|<|>)\s*(.+?)\s*$", spec)
    if not m:
        raise SystemExit(f"cannot parse --where {spec!r}")
    col, op, val = m.groups()
    return col, op, int(val) if re.fullmatch(r"-?\d+", val) else val


def cmd_read(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.apply import read_lake
    from mex_extractors_ray.cdc.filtered import plan_filtered_read, read_lake_filtered

    columns = args.columns.split(",") if args.columns else None
    preds = [_parse_where(w) for w in (args.where or [])]
    if preds:
        planned = plan_filtered_read(args.lake, preds)
        ds = read_lake_filtered(args.lake, preds, columns=columns)
    else:
        planned = None
        ds = read_lake(args.lake, columns=columns)
    if args.out:
        ds.write_parquet(args.out)
        ds = (read_lake_filtered(args.lake, preds, columns=columns)
              if preds else read_lake(args.lake, columns=columns))
    out = {"rows": ds.count(), "out": args.out}
    if planned is not None:
        out["partitions_scanned"] = len(planned)
    print(json.dumps(out))
    ray.shutdown()
    return 0


def cmd_changes(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.apply import read_changes

    ds = read_changes(args.lake, args.since)
    if args.out:
        ds.write_parquet(args.out)
        ds = read_changes(args.lake, args.since)  # count on a fresh plan
    print(json.dumps({"since": args.since, "rows": ds.count(), "out": args.out}))
    ray.shutdown()
    return 0


def cmd_replicate(args) -> int:
    ray = _ray()
    from mex_extractors_ray.cdc.replicate import replicate_lake

    kw = {"num_partitions": args.partitions} if args.partitions else {}
    if args.where:
        kw["where"] = [_parse_where(w) for w in args.where]
    m = replicate_lake(args.src, args.dst, **kw)
    print(json.dumps(m))
    ray.shutdown()
    return 0


def cmd_iexport(args) -> int:
    ray = _ray()
    from mex_extractors_ray.pipelines.incremental_export import (
        fold_export, incremental_export)

    fn = fold_export if args.fold else incremental_export
    kw = {} if args.fold else {"num_shards": args.shards}
    if not args.fold:
        # only pass filters the user actually stated — unspecified ones
        # inherit the export's recorded identity (manifest)
        if args.min_n_tok is not None:
            kw["min_n_tok"] = args.min_n_tok
        if args.where:
            kw["where"] = [_parse_where(w) for w in args.where]
    m = fn(args.lake, args.out, **kw)
    print(json.dumps({"watermark": m["watermark"], "windows": len(m["windows"])}))
    ray.shutdown()
    return 0


def cmd_export(args) -> int:
    ray = _ray()
    from mex_extractors_ray.pipelines.training_export import export_training_data
    from mex_extractors_ray.runtime import read_parquet_clean

    docs = read_parquet_clean(args.docs, columns=["doc_id", "text", "lang"])
    manifest = export_training_data(
        docs, args.out,
        min_quality=args.min_quality,
        max_dup_word_frac=args.max_dup_word_frac,
        seed=args.seed, epoch=args.epoch, num_shards=args.shards,
    )
    print(json.dumps({"shards": manifest["num_shards"],
                      "files": len(manifest["files"])}))
    ray.shutdown()
    return 0


def cmd_index(args) -> int:
    """Build / maintain / query the persisted inverted token index."""
    from mex_extractors_ray.stages import invindex

    if args.action == "build":
        ray = _ray()
        from mex_extractors_ray.runtime import read_parquet_clean

        docs = read_parquet_clean(args.docs, columns=[args.id_col, args.text_col])
        rep = invindex.build_token_index(
            docs, args.index, text_col=args.text_col, id_col=args.id_col,
            num_buckets=args.buckets, max_df=args.max_df,
            resume=args.resume, positions=args.positions)
        print(json.dumps(rep))
        ray.shutdown()
    elif args.action == "update":
        ray = _ray()
        from mex_extractors_ray.runtime import read_parquet_clean

        changes = read_parquet_clean(args.changes)
        rep = invindex.update_token_index(
            args.index, changes, update_id=args.update_id,
            segment=args.segment)
        print(json.dumps(rep))
        ray.shutdown()
    elif args.action == "compact":
        ray = _ray()
        print(json.dumps(invindex.compact_token_index(args.index)))
        ray.shutdown()
    elif args.action == "search":      # no Ray: routed point reads
        if args.bm25:
            t = invindex.bm25_topk(args.index, args.terms, k=args.k)
        elif args.phrase:
            t = invindex.phrase_lookup(args.index, args.terms)
        else:
            t = invindex.lookup_token_docs(args.index, args.terms,
                                           mode=args.mode)
        print(json.dumps({"rows": t.num_rows,
                          "result": t.to_pylist()[:args.k]}))
    else:  # pragma: no cover
        raise SystemExit(f"unknown index action {args.action!r}")
    return 0


def cmd_bpe(args) -> int:
    """BPE tokenizer training over a lake's token payload: iterate
    pair-count → merge for --merges rounds, print the merge table."""
    ray = _ray()
    from mex_extractors_ray.cdc.apply import read_lake
    from mex_extractors_ray.stages.tokens import bpe_train

    ds = read_lake(args.lake, columns=["doc_id", "tokens"])
    if args.sample_docs:
        # tokenizer training runs on a bounded corpus sample
        ds = ds.limit(args.sample_docs)
    merges, _ = bpe_train(ds, n_merges=args.merges,
                          vocab_size=args.vocab_size)
    print(json.dumps({"merges": merges.to_pylist()}))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mex_extractors_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--docs", type=int, default=10_000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen)

    i = sub.add_parser("ingest")
    i.add_argument("--log", required=True)
    i.add_argument("--lake", required=True)
    i.add_argument("-p", "--partitions", type=int, default=32)
    i.add_argument("--checks", default="", help="JSON list of drift rules")
    i.add_argument("--no-delta", action="store_true",
                   help="full-merge every window instead of delta files")
    i.add_argument("--compact-threshold", type=int, default=8,
                   help="fold base+deltas into one file at this many files")
    i.add_argument("--track-counts", default="",
                   help="comma-separated bounded-cardinality lake columns to "
                        "maintain per-partition live value counts for "
                        "(read back with `counts`)")
    i.add_argument("--track-bounds", default="",
                   help="comma-separated orderable lake columns to maintain "
                        "per-partition zone maps for (range-predicate "
                        "partition pruning in `read`)")
    i.add_argument("--constraints", default="",
                   help="write-time constraint gate: path to a JSON rule "
                        "list (stages.filters shape) or a filter YAML "
                        "(the reference's activity_filter.yaml shape); "
                        "violating events never reach the merge")
    i.add_argument("--rejects-out", dest="rejects_out", default="",
                   help="dead-letter parquet dir for gated events "
                        "(rebuilt per run — a recomputable view of the log)")
    i.add_argument("--apply-mode", dest="apply_mode", default="last_wins",
                   choices=["last_wins", "first_wins", "patch", "append"],
                   help="merge semantics (recorded in the lake meta; "
                        "mixing modes on one lake is refused)")
    i.set_defaults(fn=cmd_ingest)

    r = sub.add_parser("replay")
    r.add_argument("--log", required=True)
    r.add_argument("--lake", required=True)
    r.set_defaults(fn=cmd_replay)

    v = sub.add_parser("verify")
    v.add_argument("--lake", required=True)
    v.set_defaults(fn=cmd_verify)

    c = sub.add_parser("compact")
    c.add_argument("--lake", required=True)
    c.add_argument("--cluster-by", default=None,
                   help="sort the folded base by this column (row-group "
                        "pruning for range predicates on it)")
    c.add_argument("--row-group-rows", type=int, default=None,
                   help="parquet row-group size for the folded base")
    c.set_defaults(fn=cmd_compact)

    sp = sub.add_parser(
        "split",
        help="double ONE hot base partition's physical fan-out "
             "(extendible-hash split; cost ∝ that partition, not lake size)")
    sp.add_argument("--lake", required=True)
    sp.add_argument("--pid", type=int, default=None,
                    help="BASE partition id in [0, num_partitions); omit to "
                         "run the threshold policy instead")
    sp.add_argument("--rows-over", type=int, default=None, dest="rows_over",
                    help="policy mode: split bases with live rows above this")
    sp.add_argument("--bytes-over", type=int, default=None, dest="bytes_over",
                    help="policy mode: split bases with on-disk bytes above this")
    sp.add_argument("--dry-run", action="store_true", dest="dry_run")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_split)

    vc = sub.add_parser("vacuum", help="reclaim crash orphans (unreferenced files)")
    vc.add_argument("--lake", required=True)
    vc.add_argument("--dry-run", action="store_true")
    vc.add_argument("--retention", type=float, default=0.0,
                    help="keep split-orphan partition DIRS younger than this "
                         "many seconds (long-reader safety window)")
    vc.set_defaults(fn=cmd_vacuum)

    st = sub.add_parser("stats", help="lake summary from manifests+meta only")
    st.add_argument("--lake", required=True)
    st.set_defaults(fn=cmd_stats)

    tl = sub.add_parser("tail")
    tl.add_argument("--log", required=True)
    tl.add_argument("--lake", required=True)
    tl.add_argument("--poll", type=float, default=5.0)
    tl.add_argument("--max-polls", type=int, default=None)
    tl.add_argument("-p", "--partitions", type=int, default=32)
    tl.add_argument("--export-out", default=None, dest="export_out",
                    help="chain the incremental training export into each poll")
    tl.add_argument("--replica-out", default=None, dest="replica_out",
                    help="chain a replica lake into each poll (one feed pass)")
    tl.add_argument("--split-rows-over", type=int, default=None,
                    dest="split_rows_over",
                    help="auto-split any base partition whose live rows "
                         "exceed this after a poll's ingest")
    tl.add_argument("--split-bytes-over", type=int, default=None,
                    dest="split_bytes_over",
                    help="auto-split any base partition whose on-disk bytes "
                         "exceed this after a poll's ingest")
    tl.add_argument("--apply-mode", dest="apply_mode", default=None,
                    choices=["last_wins", "first_wins", "patch", "append"],
                    help="merge semantics; default inherits the lake's "
                         "recorded mode")
    tl.set_defaults(fn=cmd_tail)

    co = sub.add_parser("counts")
    co.add_argument("--lake", required=True)
    co.add_argument("--column", default="source")
    co.add_argument("--sum", default="",
                    help="also read SUM(<col>) per group from the "
                         "maintained grouped-sum view")
    co.set_defaults(fn=cmd_counts)

    ao = sub.add_parser("asof")
    ao.add_argument("--lake", required=True)
    ao.add_argument("--lsn", type=int, required=True)
    ao.add_argument("--out", default=None, help="optional parquet output dir")
    ao.set_defaults(fn=cmd_asof)

    rd = sub.add_parser(
        "read", help="filtered/projected lake read with predicate pushdown")
    rd.add_argument("--lake", required=True)
    rd.add_argument("--where", action="append", default=[],
                    help="predicate 'col==v' / 'col>=n' / 'col in a,b' "
                         "(repeatable; conjunctive)")
    rd.add_argument("--columns", default=None,
                    help="comma-separated projection (pushdown)")
    rd.add_argument("--out", default=None, help="optional parquet output dir")
    rd.set_defaults(fn=cmd_read)

    dl = sub.add_parser(
        "delete", help="bulk predicate delete through the CDC path "
                       "(GDPR/right-to-be-forgotten; feed- and "
                       "replica-visible ordinary deletes)")
    dl.add_argument("--lake", required=True)
    dl.add_argument("--where", action="append", required=True,
                    help="predicate (repeatable; conjunctive) — matching "
                         "LIVE docs get delete events at watermark+1")
    dl.set_defaults(fn=cmd_delete)

    ch = sub.add_parser("changes", help="change feed: all effects with lsn > --since")
    ch.add_argument("--lake", required=True)
    ch.add_argument("--since", type=int, required=True)
    ch.add_argument("--out", default=None, help="optional parquet output dir")
    ch.set_defaults(fn=cmd_changes)

    rp = sub.add_parser("replicate",
                        help="bring a replica lake current with a source "
                             "lake via its change feed (bytes ∝ lag)")
    rp.add_argument("--src", required=True)
    rp.add_argument("--dst", required=True)
    rp.add_argument("-p", "--partitions", type=int, default=None,
                    help="replica partition count (default: inherit marker, "
                         "else the source's)")
    rp.add_argument("--where", action="append", default=[],
                    help="filtered-replica predicate 'col==v' (repeatable, "
                         "conjunctive; part of the replica's identity — "
                         "omit on follow-on passes to inherit)")
    rp.set_defaults(fn=cmd_replicate)

    ie = sub.add_parser("iexport", help="incremental training export off the change feed")
    ie.add_argument("--lake", required=True)
    ie.add_argument("--out", required=True)
    ie.add_argument("--shards", type=int, default=16)
    ie.add_argument("--min-n-tok", type=int, default=None, dest="min_n_tok")
    ie.add_argument("--where", action="append", default=[],
                    help="maintained-view predicate 'col==v' (repeatable, "
                         "conjunctive; part of the export's identity — "
                         "omit on follow-on calls to inherit)")
    ie.add_argument("--fold", action="store_true",
                    help="rewrite as one fresh base window (clears retraction debt)")
    ie.set_defaults(fn=cmd_iexport)

    ex = sub.add_parser("export")
    ex.add_argument("--docs", required=True, help="documents parquet path")
    ex.add_argument("--out", required=True)
    ex.add_argument("--min-quality", type=float, default=0.0)
    ex.add_argument("--max-dup-word-frac", type=float, default=1.0)
    ex.add_argument("--seed", type=int, default=0)
    ex.add_argument("--epoch", type=int, default=0)
    ex.add_argument("--shards", type=int, default=16)
    ex.set_defaults(fn=cmd_export)

    rp = sub.add_parser("repartition")
    rp.add_argument("--lake", required=True)
    rp.add_argument("-p", "--partitions", type=int, required=True)
    rp.set_defaults(fn=cmd_repartition)

    ix = sub.add_parser(
        "index", help="inverted token index: build/update/compact/search")
    ix.add_argument("action",
                    choices=["build", "update", "compact", "search"])
    ix.add_argument("--index", required=True, help="index directory")
    ix.add_argument("--docs", help="corpus parquet (build)")
    ix.add_argument("--text-col", default="text")
    ix.add_argument("--id-col", default="doc_id")
    ix.add_argument("--buckets", type=int, default=64)
    ix.add_argument("--max-df", type=int, default=None)
    ix.add_argument("--resume", action="store_true")
    ix.add_argument("--positions", action="store_true",
                    help="store occurrence positions (phrase queries)")
    ix.add_argument("--changes",
                    help="change-set parquet (doc_id, op, old_text, new_text)")
    ix.add_argument("--update-id", help="idempotency token for update")
    ix.add_argument("--segment", action="store_true",
                    help="update as an LSM segment (write cost ∝ delta)")
    ix.add_argument("--terms", nargs="+", help="query terms (search)")
    ix.add_argument("--mode", choices=["all", "any"], default="all")
    ix.add_argument("--bm25", action="store_true")
    ix.add_argument("--phrase", action="store_true")
    ix.add_argument("-k", type=int, default=10)
    ix.set_defaults(fn=cmd_index)

    bp = sub.add_parser(
        "bpe", help="BPE tokenizer training rounds over the lake tokens")
    bp.add_argument("--lake", required=True)
    bp.add_argument("--merges", type=int, default=10)
    bp.add_argument("--vocab-size", type=int, default=50_000)
    bp.add_argument("--sample-docs", type=int, default=0,
                    help="bound the training corpus (0 = all docs)")
    bp.set_defaults(fn=cmd_bpe)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
