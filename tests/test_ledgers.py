"""Evidence-ledger invariants: regenerating a generated ledger must
not silently drop the hand-measured epilogue sections appended after
its table (r5 VERDICT item 10 — the duplication-stress section was
lost by a regen once and had to be restored from history)."""

from __future__ import annotations

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_scaling_md_keeps_epilogue_sections():
    text = (REPO / "SCALING.md").read_text()
    # the generated table must be present...
    assert "| query | sf0.001 s | sf0.01 s | sf0.1 s |" in text
    # ...and every appended evidence section must survive regeneration
    # (tools/gen_scaling.py preserves everything from the first "## ").
    for section in (
        "## Duplication stress",
        "## Histogram-sketch merge stress",
        "## KLL-sampler merge stress",
    ):
        assert section in text, (
            f"SCALING.md lost its {section!r} section — gen_scaling.py "
            "regenerated without preserving the epilogue; restore it "
            "from git history and keep the preservation logic intact"
        )


def test_gen_scaling_preserves_epilogue_logic():
    """The generator itself must carry the epilogue-preserving code —
    a rewrite that drops it would pass the content test above until
    the NEXT regeneration, so pin the mechanism too."""
    src = (REPO / "tools" / "gen_scaling.py").read_text()
    assert 'old.find("\\n## ")' in src and "epilogue" in src


_PROFILE_SECTIONS = (
    "## Session-lifetime JIT effect",
    "## Wordcount steady-time delta r03->r04: NOISE",
    "## r04->r05 suite movers: NOISE",
    "## localCheckpoint on shared subtrees: measured REGRESSION",
    "### r7 update: verdict REVERSED for tfidf under the unhinted plan",
    "## r06->r07 pre-check movers: NOISE",
    "## Streaming state-partition sizing: 22% suite win",
    "## Cross-session artifact rewrite race: ROOT-CAUSED and FIXED",
    "## near_dup_jaccard_capped r07->r08 mover: NOISE",
    "## r08->r09 bench movers: NOISE",
)


def test_profile_md_keeps_adjudication_sections():
    """PROFILE.md's hand-measured adjudication sections (JIT code-cache
    sizing, the three noise/regression A/B verdicts and the r7
    reversal) must survive regeneration — they are the evidence the
    round-over-round perf judgements rest on (r6 VERDICT item 10)."""
    text = (REPO / "PROFILE.md").read_text()
    for section in _PROFILE_SECTIONS:
        assert section in text, (
            f"PROFILE.md lost its {section!r} section — "
            "tools/profile_queries.py regenerated without it; restore "
            "from git history and re-sync the generator's EPILOGUE"
        )


def test_profile_generator_carries_adjudication_sections():
    """The generator's static EPILOGUE must contain every adjudication
    section, so a regen CANNOT drop them (content test above would
    only catch it after the fact)."""
    src = (REPO / "tools" / "profile_queries.py").read_text()
    for section in _PROFILE_SECTIONS:
        assert section in src, (
            f"tools/profile_queries.py EPILOGUE lost {section!r}"
        )


def test_explain_md_pins_persisted_index_plans():
    """EXPLAIN.md must keep the persisted-index plan sections WITH
    their load-bearing plan fragments: partition pruning on the probed
    cells and the codes-only ADC scan. A gen_explain.py edit that
    drops these queries (or a plan change that silently loses the
    pruning) must fail here, not in the next verdict."""
    text = (REPO / "EXPLAIN.md").read_text()
    for section in (
        "## ann_pq_topk",
        "## ann_ivf_pq_topk",
        "## ann_ivf_indexed_topk",
    ):
        assert section in text, f"EXPLAIN.md lost {section!r}"
    # key assertion strings inside those plans
    assert "PartitionFilters: [cell#" in text, "cell pruning gone"
    assert "ReadSchema: struct<vec_id:bigint,codes:array<int>>" in text, (
        "codes-only ADC scan gone"
    )


def test_profile_pins_parity_run_for_current_window_round():
    """r9 (VERDICT r8 item 7): each round must RECORD a full-registry
    sf0.01 parity run in PROFILE.md. Keyed off the builder-stamped
    window horizon (`_WINDOW_LEDGER_MAX + 1` = the round the
    checked-in window was generated for), NOT the CORRECTNESS files
    on disk — the driver drops a new ledger file after the builder's
    session, and a guard keyed on disk state would go red on every
    drop (the r8 rotation-guard lesson)."""
    from mapreduce511_spark.queries import _WINDOW_LEDGER_MAX

    rnd = _WINDOW_LEDGER_MAX + 1
    text = (REPO / "PROFILE.md").read_text()
    assert (
        f"Driver-mirror parity at sf0.01: full-registry re-proof (round {rnd})"
        in text
    ), (
        f"PROFILE.md lacks the round-{rnd} sf0.01 parity record — run "
        f"SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 pytest "
        f"tests/test_oracle_parity.py and pin the result"
    )
