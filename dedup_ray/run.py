"""CLI / ``ray job submit`` entry point.

    python -m dedup_ray.run --input <pages parquet dir> --output <dir> \
        [--ckpt <dir>] [--shingle-k 17] [--min-doc-len 5000] ...

Reads the input corpus (input_hint schema: url, warc_ts, html, text, lang —
``html`` is extracted when present, otherwise ``text`` is used directly),
runs the near-dedup pipeline, writes the output + verified pairs + clusters
as partitioned Parquet.  Owns its Ray session only when none exists (so the
same module works under ``ray job submit``, which pre-initialises Ray).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages file/dir")
    p.add_argument("--input-format", choices=["auto", "parquet", "jsonl", "csv"],
                   default="auto",
                   help="input encoding (auto: by extension, parquet default); "
                        "jsonl/csv rows need the same columns as the parquet "
                        "corpus (url + html, or url + text)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--ckpt", default=None, help="checkpoint directory (resumable)")
    p.add_argument("--num-cpus", type=int, default=None)
    # every reference CLI knob (SURVEY.md §2.10)
    p.add_argument("--shingle-k", type=int, default=17)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--containment-threshold", type=float, default=0.2)
    p.add_argument("--full-duplication-threshold", type=float, default=0.9)
    p.add_argument("--end-buffer", type=int, default=25000)
    p.add_argument("--duplicate-df-lower", type=int, default=2)
    p.add_argument("--duplicate-df-upper", type=int, default=4)
    p.add_argument("--alignment-max-gap", type=int, default=25000)
    p.add_argument("--alignment-match-weight", type=float, default=0.2)
    p.add_argument("--alignment-min-coverage", type=float, default=0.2)
    p.add_argument("--min-doc-len", type=int, default=5000)
    p.add_argument("--candidate-strategy", choices=["dup_index", "minhash_lsh"],
                   default="dup_index")
    p.add_argument("--num-partitions", type=int, default=64)
    # reference housekeeping knobs (dedup.py:546-574): --threads maps to
    # --num-cpus above; --tmp_dir / --save_tmp / --log_level as follows
    p.add_argument("--tmp-dir", default=None,
                   help="scratch directory for intermediate artifacts "
                        "(default: <output>/tmp when --save-tmp is given)")
    p.add_argument("--save-tmp", action="store_true",
                   help="persist intermediate tables (matched shingles, "
                        "candidates, dup stats) under the tmp dir")
    p.add_argument("--log-level", default="INFO",
                   choices=["DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"],
                   help="engine logging level (dedup.log + console; "
                        "reference default is DEBUG-ish, dedup.py:574-578)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    from .logging_config import setup_logger

    # S15: file + console log sink (reference logging_config.py:5-36) —
    # dedup.log lands next to the output tables
    os.makedirs(args.output, exist_ok=True)
    log = setup_logger(
        log_file=os.path.join(args.output, "dedup.log"), verbosity=args.log_level
    )
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            # Ray internals capped at WARNING: --log-level governs the
            # engine's own sink, not Ray Data's executor chatter
            logging_level=(
                args.log_level
                if args.log_level in ("WARNING", "ERROR", "CRITICAL")
                else "WARNING"
            ),
            runtime_env={
                # keep worker heaps resident between tasks (see bench.py)
                "env_vars": {
                    "MALLOC_MMAP_THRESHOLD_": "1073741824",
                    "MALLOC_TRIM_THRESHOLD_": "1073741824",
                }
            },
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .config import DedupConfig
    from .pipelines.dedup import near_dedup_pipeline
    from .stages.extract import docs_from_text_batch, extract_batch

    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        containment_threshold=args.containment_threshold,
        full_duplication_threshold=args.full_duplication_threshold,
        end_buffer=args.end_buffer,
        duplicate_df_lower=args.duplicate_df_lower,
        duplicate_df_upper=args.duplicate_df_upper,
        alignment_max_gap=args.alignment_max_gap,
        alignment_match_weight=args.alignment_match_weight,
        alignment_min_coverage=args.alignment_min_coverage,
        min_doc_len=args.min_doc_len,
        candidate_strategy=args.candidate_strategy,
        num_partitions=args.num_partitions,
    )

    fmt = args.input_format
    if fmt == "auto":
        low = args.input.lower()
        fmt = (
            "jsonl"
            if low.endswith((".jsonl", ".json", ".ndjson"))
            else "csv" if low.endswith(".csv") else "parquet"
        )
    if fmt == "jsonl":
        pages = rd.read_json(args.input)
    elif fmt == "csv":
        pages = rd.read_csv(args.input)
    else:
        pages = rd.read_parquet(args.input)
    cols = pages.schema().names
    if "html" in cols:
        docs = pages.map_batches(extract_batch, batch_format="pyarrow")
    else:
        docs = pages.map_batches(docs_from_text_batch, batch_format="pyarrow")

    ckpt = None
    if args.ckpt:
        from .state.checkpoint import CheckpointManager, corpus_fingerprint

        files = sorted(glob.glob(os.path.join(args.input, "*.parquet"))) or [args.input]
        ckpt = CheckpointManager(
            args.ckpt,
            {"cfg": cfg.__dict__, "input": corpus_fingerprint(files)},
        )

    log.info("near-dedup run: input=%s output=%s", args.input, args.output)
    result = near_dedup_pipeline(docs, cfg, ckpt=ckpt)
    import shutil

    # K4: deterministic output order — every sink is sorted on a stable key
    # before writing (the reference iterates contigs in input order,
    # dedup.py:179; url carries that order here).
    sort_keys = {
        "output": ["url"],
        "verified": ["url_a", "url_b"],
        "clusters": ["uid"],
        "decisions": ["loser_url", "winner_url", "start", "end"],
        "alignments": ["query_url", "target_url", "qstart", "qend"],
    }
    for name, keys in sort_keys.items():
        out_dir = os.path.join(args.output, name)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = result[name]
        n = ds.count()
        if n > 0:
            ds = ds.sort(keys)
        ds.write_parquet(out_dir)
        log.info("wrote sink %s: %d rows", name, n)
    if args.save_tmp:
        tmp_dir = args.tmp_dir or os.path.join(args.output, "tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        for name in ("matched", "candidates", "dup_sets", "exact_edges"):
            t_dir = os.path.join(tmp_dir, name)
            shutil.rmtree(t_dir, ignore_errors=True)
            result[name].write_parquet(t_dir)
    summary = {
        "docs": pages.count(),
        "output_rows": result["output"].count(),
        "verified_pairs": result["verified"].count(),
        "clustered_docs": result["clusters"].count(),
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f)
    log.info("summary: %s", json.dumps(summary))
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
