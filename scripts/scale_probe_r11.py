"""Round-11 scale probe: growth curves for the eight newly registered
operators and the eight r12-banked ones across sf0.001 -> 0.01 -> 0.1.

Warm session, min-of-N per point. Prints one JSON line per operator:
{"name": ..., "secs": {"0.001": s, "0.01": s, "0.1": s},
 "ratios": [r_01, r_1]} where ratios are per-decade growth (10x data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

from k_means_clustering_via_map_reduce_spark.session import get_spark

import k_means_clustering_via_map_reduce_spark.queries as Q

Q.load_all()

from k_means_clustering_via_map_reduce_spark.operators.multimodal import (  # noqa: E402
    m17_windowed_energy,
)
from k_means_clustering_via_map_reduce_spark.operators.sampling import (  # noqa: E402
    p17_dedup_aware_mix,
)
from k_means_clustering_via_map_reduce_spark.operators.similarity import (  # noqa: E402
    s13_exact_pruned_topk,
)
from k_means_clustering_via_map_reduce_spark.operators.text import (  # noqa: E402
    t34_vocab_overlap,
)
from k_means_clustering_via_map_reduce_spark.queries import (  # noqa: E402
    q101_bitemporal_asof,
    q102_mad_outliers,
)
from k_means_clustering_via_map_reduce_spark.sources.python_source import (  # noqa: E402
    f38_null_count_skipping,
)
from k_means_clustering_via_map_reduce_spark.streaming.stateful import (  # noqa: E402
    session_timers_query,
)

REGISTERED = [
    "q98_max_drawdown",
    "q99_interval_union",
    "q100_reconciliation",
    "f37_multi_table_txn_read",
    "k28_pinned_enrich",
    "t33_rake_keywords",
    "d16_golden_records",
    "m16_clipping_runs",
]

BANKED = {
    "s13_exact_pruned_topk": s13_exact_pruned_topk,
    "k29_session_timers": session_timers_query,
    "f38_null_count_skipping": f38_null_count_skipping,
    "t34_vocab_overlap": t34_vocab_overlap,
    "q101_bitemporal_asof": q101_bitemporal_asof,
    "q102_mad_outliers": q102_mad_outliers,
    "p17_dedup_aware_mix": p17_dedup_aware_mix,
    "m17_windowed_energy": m17_windowed_energy,
}

SFS = ["0.001", "0.01", "0.1"]
N_RUNS = int(os.environ.get("PROBE_RUNS", "2"))


def main() -> None:
    spark = get_spark(app_name="kmce-scale-probe")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm
    fns = {n: Q.QUERIES[n] for n in REGISTERED}
    fns.update(BANKED)
    for name, fn in fns.items():
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
