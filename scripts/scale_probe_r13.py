"""Decade scale curves for the round-14 bank (the round-12 pattern):
warm session, min-of-2 per point, sf0.001 -> sf0.01 -> sf0.1 —
collect()ed (never count(): Catalyst prunes measured subtrees).

Run: python scripts/scale_probe_r13.py   (prints markdown rows;
paste/refresh the BASELINE.md section from them).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_clustering_via_map_reduce_spark.session import get_spark

OPS = [
    ("f43", "k_means_clustering_via_map_reduce_spark.queries",
     "f43_drop_column_read"),
    ("f44", "k_means_clustering_via_map_reduce_spark.queries",
     "f44_timestamp_travel_read"),
    ("q106", "k_means_clustering_via_map_reduce_spark.queries",
     "q106_distinct_grouping_sets"),
    ("t37", "k_means_clustering_via_map_reduce_spark.operators.text",
     "t37_char_trigram_profile"),
    ("d20", "k_means_clustering_via_map_reduce_spark.operators.dedup",
     "d20_url_canonical_dup"),
    ("p19", "k_means_clustering_via_map_reduce_spark.operators.sampling",
     "p19_source_topk_quality"),
    ("k32", "k_means_clustering_via_map_reduce_spark.streaming.joins",
     "k32_stream_scd2_enrich"),
    ("m19", "k_means_clustering_via_map_reduce_spark.operators.multimodal",
     "m19_zero_crossings"),
    ("s14", "k_means_clustering_via_map_reduce_spark.operators.similarity",
     "s14_nearest_centroid_census"),
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]


def main() -> None:
    import importlib

    spark = get_spark(app_name="kmce-scale-probe-r13")
    spark.range(1000).selectExpr("sum(id)").collect()
    print("| op | sf0.001 | sf0.01 | sf0.1 | /decade |")
    print("|---|---|---|---|---|")
    for tag, mod_name, fn_name in OPS:
        fn = getattr(importlib.import_module(mod_name), fn_name)
        times = []
        for sf in SFS:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append(best)
        g1 = times[1] / times[0]
        g2 = times[2] / times[1]
        print(
            f"| {tag} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {g1:.1f}/{g2:.1f} |"
        )


if __name__ == "__main__":
    main()
