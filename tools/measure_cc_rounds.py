"""Measure the gate's dedup_clusters connected-components round count
at a scale fixture (VERDICT r13 next #2 evidence; PLANS #54).

Builds the exact corpus + minhash pair graph the `dedup_clusters` gate
builds and reads the round/convergence counters
``connected_components`` stamps into the result column metadata.

    python tools/measure_cc_rounds.py .scale/sf1 .scale/sf10

r14 measurements (seed-42 fixtures): sf1 (100k nodes) -> 2 rounds,
sf10 (1M nodes) -> 3 rounds, both converged — so the 12.4x sf1->sf10
bench ratio is ~10x edges x 1.5x rounds, and min-label stays in the
gate (two-phase large-star/small-star is the switch if a future rung
shows rounds climbing past ~5)."""
import gc
import json
import sys
import time

sys.path.insert(0, ".")

from dw_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="cc_rounds")
    import __spark_entry__ as e
    from dw_etl_spark.operators.graph import connected_components
    from dw_etl_spark.operators.text_dedup import minhash_lsh_pairs

    out = {}
    for sf_dir in sys.argv[1:]:
        corpus = e._docs_with_copies(spark, sf_dir, " qq")
        pairs = minhash_lsh_pairs(
            corpus, "text", "doc_id", n=2, num_hashes=32, bands=8,
            min_jaccard=0.5,
        )
        t0 = time.perf_counter()
        comp = connected_components(pairs)
        n = comp.count()
        meta = comp.schema["component"].metadata
        out[sf_dir] = {
            "rounds": meta.get("iterations"),
            "converged": meta.get("converged"),
            "nodes": n,
            "cc_sec": round(time.perf_counter() - t0, 2),
        }
        print(json.dumps({sf_dir: out[sf_dir]}), flush=True)
        spark.catalog.clearCache()
        gc.collect()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    print("FINAL", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
