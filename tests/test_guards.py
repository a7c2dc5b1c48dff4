"""Unit tests for round-3 guard/helper functions: the parquet nanos
footer detector and the half-away-from-zero rounding helper."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce511_spark.operators.ann import _round_half_away
from mapreduce511_spark.sources.tables import assert_no_nanos_columns


def test_round_half_away_matches_sql_round_on_midpoints():
    # np.round would give 0.1234 for 0.12345 (half-to-even); SQL/DuckDB
    # round half away from zero gives 0.1235
    vals = np.array([0.12345, -0.12345, 0.12355, 1.00005])
    got = _round_half_away(vals, 4)
    assert got.tolist() == [0.1235, -0.1235, 0.1236, 1.0001]
    # sanity: differs from banker's rounding exactly where expected
    # (0.12345 * 1e4 is exactly 1234.5; half-to-even rounds DOWN to
    # the even 1234, half-away rounds UP)
    assert np.round(0.12345, 4) == 0.1234  # numpy half-to-even artifact


def test_round_half_away_non_midpoints_agree_with_np_round():
    rng = np.random.default_rng(7)
    vals = rng.uniform(-1, 1, 1000)
    # away-from-midpoint values round identically under either mode
    safe = vals[np.abs((vals * 1e4) % 1 - 0.5) > 1e-6]
    assert np.allclose(_round_half_away(safe, 4), np.round(safe, 4))


def test_nanos_footer_guard_accepts_micros_and_int96(tmp_path):
    import pandas as pd

    # micros file (what engine artifacts should contain)
    t = pa.table(
        {"ts": pa.array(pd.date_range("2024-01-01", periods=3, freq="s")).cast(
            pa.timestamp("us")
        )}
    )
    p = str(tmp_path / "us.parquet")
    pq.write_table(t, p)
    assert_no_nanos_columns(p)  # must not raise

    # INT96 (Spark's default writer output) also maps to arrow ns but
    # reads back fine — the guard must not flag it
    p96 = str(tmp_path / "int96.parquet")
    t96 = pa.table(
        {"ts": pa.array(pd.date_range("2024-01-01", periods=3, freq="s"))}
    )
    pq.write_table(t96, p96, use_deprecated_int96_timestamps=True)
    assert_no_nanos_columns(p96)  # must not raise


def test_nanos_footer_guard_rejects_int64_nanos(tmp_path):
    import pandas as pd

    t = pa.table(
        {"ts": pa.array(pd.date_range("2024-01-01", periods=3, freq="s"))}
    )  # defaults to timestamp[ns] -> INT64 TIMESTAMP(NANOS)
    p = str(tmp_path / "ns.parquet")
    pq.write_table(t, p, coerce_timestamps=None, store_schema=False)
    with pytest.raises(TypeError, match="nanos"):
        assert_no_nanos_columns(p)


def test_nanos_footer_guard_walks_directories(tmp_path):
    import pandas as pd

    sub = tmp_path / "part=0"
    sub.mkdir()
    t = pa.table(
        {"ts": pa.array(pd.date_range("2024-01-01", periods=3, freq="s"))}
    )
    pq.write_table(t, str(sub / "f.parquet"), coerce_timestamps=None, store_schema=False)
    with pytest.raises(TypeError, match="nanos"):
        assert_no_nanos_columns(str(tmp_path))


def test_bench_headline_names_resolve():
    """Every bench HEADLINE name must exist in the registry (bench
    silently skips unknown names, so a typo would quietly drop a
    benchmark) and appear exactly once."""
    import bench
    from mapreduce511_spark import queries as suite

    names = bench.HEADLINE
    assert len(names) == len(set(names))
    registry = suite.all_queries()
    missing = [n for n in names if n not in registry]
    assert not missing, missing


def test_register_rejects_duplicate_names():
    """The registry must fail loudly on a duplicate query name —
    silent dict shadowing already bit once."""
    from mapreduce511_spark import queries as suite

    suite.all_queries()  # ensure modules loaded
    with pytest.raises(ValueError, match="already registered"):
        @suite.register("wordcount")
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_driver_sample_window_is_exactly_50_known_names():
    """The correctness driver samples the FIRST 50 registry entries
    each round; _ENUMERATE_FIRST is that window. It must hold exactly
    50 names, every one registered — a typo'd or stale name silently
    shrinks driver coverage (the ordered dict just skips it)."""
    from mapreduce511_spark import queries as suite

    q = suite.all_queries()
    window = suite._ENUMERATE_FIRST
    assert len(window) == 50, len(window)
    missing = [n for n in window if n not in q]
    assert not missing, missing
    assert len(set(window)) == 50, "duplicate names in the window"
    # and the ordering actually front-loads them
    assert list(q)[:50] == window


def test_bench_canary_is_frozen_and_registered():
    """bench.py's _CANARY is the self-adjudicating round-over-round
    comparator (r6 VERDICT item 4): exactly 20 names, every one
    registered — a rename that forgets the canary would KeyError the
    whole bench, and an accidental add/remove would silently break
    round comparability."""
    import bench
    from mapreduce511_spark import queries as suite

    q = suite.all_queries()
    assert len(bench._CANARY) == 20
    assert len(set(bench._CANARY)) == 20
    missing = [n for n in bench._CANARY if n not in q]
    assert not missing, missing


_UNBOUNDED_MARKERS = (
    "UNBOUNDED",
    "uncapped",
    "quadratic by construction",
)


def test_no_plain_name_steers_to_unbounded_candidates():
    """r8 (r7 VERDICT item 1) — mechanical registry-steering rule:
    when a scale-safe ``_capped``/``_blocked`` sibling exists, the
    plain-named query must not be the one whose docstring declares an
    unbounded candidate stage. The plain name is what a user reaches
    for first; the deliberately-definitional variant carries the
    ``_exact_spec`` suffix (the ``embedding_near_dup`` /
    ``tfidf_cosine_pairs`` precedents)."""
    from mapreduce511_spark.queries import all_queries

    qs = all_queries()
    offenders = []
    for name, fn in qs.items():
        if name.endswith("_exact_spec"):
            continue  # honestly suffixed: allowed to be definitional
        has_scale_sibling = any(
            name + suf in qs for suf in ("_capped", "_blocked")
        )
        if not has_scale_sibling:
            continue
        doc = fn.__doc__ or ""
        if any(m in doc for m in _UNBOUNDED_MARKERS):
            offenders.append(name)
    assert not offenders, (
        f"plain-named queries declaring an unbounded candidate stage "
        f"while a capped/blocked sibling exists: {offenders} — rename "
        f"to <name>_exact_spec and make the capped sibling the "
        f"recommended entry"
    )
    # the rule has teeth: the suffixed spec queries DO carry the
    # marker (i.e. the historical offenders would have been caught)
    spec = qs["tfidf_cosine_pairs_exact_spec"].__doc__ or ""
    assert any(m in spec for m in _UNBOUNDED_MARKERS)


def test_exact_spec_declarations_carry_the_suffix():
    """Any query whose docstring declares itself 'EXACT SPEC' /
    'EXACT SMALL-N SPEC' (the capital-letters self-declaration the
    spec-tier queries use) must be registered under a name ending in
    ``_exact_spec`` — so bench's spec-tier breakout and the steering
    rule above can key on the NAME alone."""
    from mapreduce511_spark.queries import all_queries

    offenders = [
        n
        for n, fn in all_queries().items()
        if "EXACT SPEC" in (fn.__doc__ or "")
        or "EXACT SMALL-N SPEC" in (fn.__doc__ or "")
        if not n.endswith("_exact_spec")
    ]
    assert not offenders, offenders


def test_new_queries_front_load_the_driver_window():
    """r8 (r7 VERDICT item 10): every registered query with NO driver
    row in ANY prior round's CORRECTNESS ledger (i.e. new or renamed
    this round) MUST appear in `_ENUMERATE_FIRST`, mechanically
    enforcing 'driver-checked in its debut round'. Regenerate the
    window with `python tools/gen_enum_first.py` when this fails."""
    import glob
    import json

    from mapreduce511_spark.queries import _ENUMERATE_FIRST, all_queries

    seen: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        seen.update(json.load(open(f)))
    assert seen, "ledger files must be visible from the repo root"
    missing = [
        n
        for n in all_queries()
        if n not in seen and n not in _ENUMERATE_FIRST
    ]
    assert not missing, (
        f"queries debuting this round are outside the driver window: "
        f"{missing}"
    )


def test_enum_first_matches_generator_policy():
    """The checked-in window IS the generator's output (no hand drift):
    exactly the never-checked names first, then oldest-first
    staleness, 50 names total.

    r9 (VERDICT r8 item 1): recomputation honors the stamped ledger
    horizon `_WINDOW_LEDGER_MAX` — the driver drops a new
    CORRECTNESS_r{N}.json AFTER the builder's session, and a guard
    that re-derived the window from every file on disk went red after
    every driver run even though the checked-in window was correct
    when generated.  compute_window() defaults to the stamp, so this
    test stays green across the driver's artifact drop; regenerating
    the window (--restamp) must bump the stamp too, which this test
    then re-verifies."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("tools").resolve().parent))
    from mapreduce511_spark.queries import _ENUMERATE_FIRST
    from tools.gen_enum_first import compute_window

    assert [n for n, _ in compute_window()] == list(_ENUMERATE_FIRST)


def test_window_guard_is_idempotent_across_driver_drop(tmp_path):
    """The exact failure mode of r8: the driver writes
    CORRECTNESS_r{N+1}.json into the repo after the window was
    generated.  Simulate that drop in a copy of the repo root's
    ledger and assert the stamped recomputation is UNCHANGED — the
    guard above must not flip red at the end of a round."""
    import json
    import shutil
    import sys
    from pathlib import Path
    from unittest import mock

    sys.path.insert(0, str(Path("tools").resolve().parent))
    import tools.gen_enum_first as gen
    from mapreduce511_spark.queries import _WINDOW_LEDGER_MAX

    for f in Path(gen.REPO).glob("CORRECTNESS_r*.json"):
        shutil.copy(f, tmp_path / f.name)
    before = gen.compute_window()
    # a future driver drop: every current window name goes green in a
    # round past the stamp
    fake = {name: {"hash_match": True} for name, _ in before}
    nxt = tmp_path / f"CORRECTNESS_r{_WINDOW_LEDGER_MAX + 1:02d}.json"
    nxt.write_text(json.dumps(fake))
    with mock.patch.object(gen, "REPO", str(tmp_path)):
        after = gen.compute_window()
    assert after == before
    # and WITHOUT the stamp the drop genuinely rotates the window —
    # i.e. the horizon is what carries the idempotence
    with mock.patch.object(gen, "REPO", str(tmp_path)):
        unstamped = gen.compute_window(ledger_max=None)
    assert unstamped != before


def test_bench_derived_steadies_are_min_of_3():
    """r9 (VERDICT r8 item 6): the derived headline steadies
    (`wordcount_steady_s`, `wordcount_skewed_steady_s`) must come
    from the min-of-3 helper, not single shots — r8's single-shot
    measurement whipsawed 0.45 -> 1.068 s on a hypervisor stall and
    produced a false regression alarm. AST-audit bench.main: both
    assignments call _min3, and _min3 loops exactly range(3)."""
    import ast
    from pathlib import Path

    tree = ast.parse(Path("bench.py").read_text())
    main = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    assigns = {}
    min3 = None
    for node in ast.walk(main):
        if isinstance(node, ast.FunctionDef) and node.name == "_min3":
            min3 = node
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name) and t.id in ("steady", "skew_steady"):
                assigns[t.id] = node.value
    assert min3 is not None, "bench.main lost its _min3 helper"
    reps = [
        n.args[0].value
        for n in ast.walk(min3)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name)
        and n.func.id == "range"
    ]
    assert reps == [3], reps
    for key in ("steady", "skew_steady"):
        v = assigns.get(key)
        assert (
            isinstance(v, ast.Call)
            and isinstance(v.func, ast.Name)
            and v.func.id == "_min3"
        ), f"{key} is not a _min3 measurement"
