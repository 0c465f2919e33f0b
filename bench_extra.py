"""Round-6 measurement harness (bench.py is FROZEN for the driver; this
file holds the extra instrumentation the optimization guide asks for):

- per-query isolation with the noop sink (guide §1.4) — times the
  computation, not the sink, and computes every column of every row;
- ``.explain("formatted")`` capture to plans/<tag>/ for the plan-diff
  evidence the judge checks;
- job labels (guide §1.5).

Usage:
  python bench_extra.py --tag r06/before --queries lookup_candidates ...
  python bench_extra.py --tag r06/after --repeat 3 --no-plans
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "lookup_candidates", "lookup_token_match", "bow_similarity",
    "conv_textrank", "graph_pagerank", "kg_transe_train",
    "kg_rule_mining", "corpus_rake", "corpus_ngram_novelty",
    "dedup_substring_spans", "bm25_topk", "candidate_argmax",
    "literal_classify", "pair_predicate_probe", "topk_per_group",
    "sessionize_events", "literal_freq", "pred_freq",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--tag", default="r06/probe")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from lamapi_spark.queries import queries
    from lamapi_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="lamapi_spark_bench_extra",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    qs = queries()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    # same steady-state warmup discipline as bench.py
    for name in args.queries:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    out: dict[str, dict] = {}
    for name in args.queries:
        df = qs[name](spark, args.sf)
        if not args.no_plans:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if args.no_noop:
            continue
        times = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"noop:{name}:{i}")
            t0 = time.time()
            (qs[name](spark, args.sf)
             .write.format("noop").mode("overwrite").save())
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        times_sorted = sorted(times)
        out[name] = {"noop_sec": times, "min": times_sorted[0],
                     "median": times_sorted[len(times_sorted) // 2]}
        print(json.dumps({"query": name, **out[name]}), flush=True)

    print(json.dumps({"tag": args.tag, "sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
