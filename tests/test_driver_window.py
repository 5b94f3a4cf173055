"""Driver-window discipline pins (VERDICT r11 "Next round" #8).

The verify driver records CORRECTNESS rows for the FIRST 50 registry
entries in debt order. The r10 overflow mistake was registering more
new entries than the window could hold alongside the stale-refresh
tier; these pins make that regression a test failure instead of a
prose rule.
"""

from __future__ import annotations

import importlib.util
import os

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "__spark_entry__.py")

WINDOW = 50


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_new_registrations_plus_stale_tier_fit_the_window():
    """Every never-verified entry AND every entry in the oldest green
    tier must land inside the first-50 driver window together —
    otherwise a stale entry silently waits another full round."""
    mod = _load_entry()
    names = list(mod.queries())
    latest = mod._latest_green_round()
    new = [n for n in names if n not in latest]
    rounds = sorted({latest[n] for n in names if n in latest})
    oldest = rounds[0] if rounds else None
    stale = [n for n in names if latest.get(n) == oldest]
    assert len(new) + len(stale) <= WINDOW, (
        f"{len(new)} new + {len(stale)} oldest-tier (r{oldest:02d}) "
        f"entries exceed the {WINDOW}-row driver window — registration "
        "overflow (the r10 mistake)"
    )


def test_debt_order_puts_new_then_oldest_first():
    """The first-50 window must BE the new entries followed by the
    oldest green tiers — no fresher entry may displace a staler one."""
    mod = _load_entry()
    names = list(mod.queries())
    latest = mod._latest_green_round()
    keys = [latest.get(n, 0) for n in names]
    assert keys == sorted(keys), "registry is not in debt order"


def test_every_query_has_oracle_or_documented_rows_only():
    """The rows-only set is contractual and must stay the documented
    seeded/hashed entries — a NEW entry without an oracle is a
    registration bug, not a new contract."""
    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    rows_only = {n for n in qs if n not in osql}
    documented = {
        "k1b_lloyd_join_largek", "k2_kmeans_mllib", "k14_production_fit",
        "d2_minhash_lsh_pairs", "s2_lsh_topk", "s3_ivf_topk",
        "s5_pq_adc_topk", "s7_persisted_ivf_topk",
        "s8_ivfpq_persisted_topk", "t5_sketch_stats",
        "p1_stratified_sample", "t23_bpe_learned",
    }
    assert rows_only == documented, (
        f"rows-only drift: +{rows_only - documented} "
        f"-{documented - rows_only}"
    )


R13_BANK = {
    "f40_bloom_skipping", "f41_generated_column",
    "f42_conditional_merge", "k31_streaming_topk",
    "d18_containment_pairs", "d19_prefix_jaccard_pairs",
    "q104_decayed_engagement", "q105_belief_drift",
    "p18_temperature_mix", "t36_readability",
}

# Staged round-14 bank (library-first; registered in round 14). Sized
# at NINE because the post-r13 oldest tier is r08 with 41 entries:
# 41 + 9 = 50 exactly.
R14_BANK = {
    "f43_drop_column_read", "f44_timestamp_travel_read",
    "q106_distinct_grouping_sets", "t37_char_trigram_profile",
    "d20_url_canonical_dup", "p19_source_topk_quality",
    "k32_stream_scd2_enrich", "m19_zero_crossings",
    "s14_nearest_centroid_census",
}


def test_registered_new_set_is_exactly_one_bank():
    """The never-verified set must BE one registered bank, whole — an
    op built but left unregistered is unreachable engine surface, a
    surprise extra registration would eat stale-refresh window rows,
    and a PARTIAL bank registration is the drift this pins (the
    arithmetic is asserted against the bank LIST, not prose —
    VERDICT r12 "What's wrong" #3)."""
    mod = _load_entry()
    names = list(mod.queries())
    latest = mod._latest_green_round()
    new = {n for n in names if n not in latest}
    # Empty right after a CORRECTNESS round lands; equals exactly one
    # bank in the registration window between rounds.
    assert new in (set(), R13_BANK, R14_BANK), (
        f"registered-but-never-verified set is not a whole bank: {new}"
    )
    assert R13_BANK <= set(names), "an r13 bank op fell out of the registry"


def test_registry_plateaus_at_300():
    """The registry holds 291 entries today and exactly 300 after the
    r14 bank lands — and then PLATEAUS: every latest-green tier is
    exactly 50 from r15 on, so the remaining rounds are one full
    6 x 50 refresh cycle with zero window slack (BASELINE.md
    "registry-plateau math"). A 301st registration would silently age
    a stale entry past the six-round cycle; fail it here instead."""
    mod = _load_entry()
    n = len(mod.queries())
    assert n in (291, 300), (
        f"registry has {n} entries — the documented plateau is 291 "
        "(pre-r14-bank) or 300 (post); registering beyond 300 breaks "
        "the refresh-cycle arithmetic for rounds 15-20"
    )
