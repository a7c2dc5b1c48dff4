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
