"""Decade scale curves (sf0.001 -> 0.01 -> 0.1) for the round-13 bank,
measured pre-registration like every prior wave (BASELINE.md pattern):
warm session, min-of-N wall per point, per-decade growth ratios.

Usage: python scripts/scale_probe_r12.py   (PROBE_RUNS=2 default)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_clustering_via_map_reduce_spark.session import get_spark

import k_means_clustering_via_map_reduce_spark.queries as Q

Q.load_all()

from k_means_clustering_via_map_reduce_spark.operators.dedup import (  # noqa: E402
    d18_containment_pairs,
    d19_prefix_jaccard_pairs,
)
from k_means_clustering_via_map_reduce_spark.operators.sampling import (  # noqa: E402
    p18_temperature_mix,
)
from k_means_clustering_via_map_reduce_spark.operators.text import (  # noqa: E402
    t36_readability,
)
from k_means_clustering_via_map_reduce_spark.sources.python_source import (  # noqa: E402
    f40_bloom_skipping,
)
from k_means_clustering_via_map_reduce_spark.streaming.stateful import (  # noqa: E402
    streaming_topk_query,
    tws_runtime_available,
)

BANKED = {
    "f40_bloom_skipping": f40_bloom_skipping,
    "f41_generated_column": Q.f41_generated_column,
    "f42_conditional_merge": Q.f42_conditional_merge,
    "d18_containment_pairs": d18_containment_pairs,
    "d19_prefix_jaccard_pairs": d19_prefix_jaccard_pairs,
    "q104_decayed_engagement": Q.q104_decayed_engagement,
    "q105_belief_drift": Q.q105_belief_drift,
    "p18_temperature_mix": p18_temperature_mix,
    "t36_readability": t36_readability,
}
if tws_runtime_available():
    BANKED["k31_streaming_topk"] = streaming_topk_query

SFS = ["0.001", "0.01", "0.1"]
N_RUNS = int(os.environ.get("PROBE_RUNS", "2"))


def main() -> None:
    spark = get_spark(app_name="kmce-scale-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm
    for name, fn in BANKED.items():
        secs = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = None
            for _ in range(N_RUNS):
                t0 = time.monotonic()
                fn(spark, sf_dir).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            secs[sf] = round(best, 3)
        ratios = [
            round(secs["0.01"] / max(secs["0.001"], 1e-9), 2),
            round(secs["0.1"] / max(secs["0.01"], 1e-9), 2),
        ]
        print(json.dumps({"name": name, "secs": secs, "ratios": ratios}),
              flush=True)


if __name__ == "__main__":
    main()
