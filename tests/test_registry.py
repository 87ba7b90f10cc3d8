"""Driver-sampler window invariants (no SparkSession needed).

The driver hash-certifies the alphabetically-first 50 registry names
each round.  These tests pin the round-9 rotation contract from
queries/aliases.py: the window must be 50 FIRST-TIME names — zero
re-hashes of anything certified in rounds 1..=_CERTIFIED_THROUGH.

When rotating the window next round, bump ``_CERTIFIED_THROUGH`` (so
the freshly committed CORRECTNESS_r0N.json counts as spent) and
re-point queries/aliases.py at the next never-sampled tranche.
"""

from __future__ import annotations

import glob
import json
import os
import re

from grouper_spark.queries import load_all

_CERTIFIED_THROUGH = 9  # rounds whose CORRECTNESS files are "spent"
_ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _certified_names() -> set[str]:
    """Names with a green row in any committed CORRECTNESS file
    through round _CERTIFIED_THROUGH, plus the de-aliased originals."""
    out: set[str] = set()
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r0*.json")):
        rnd = int(re.search(r"_r0*(\d+)\.json$", path).group(1))
        if rnd > _CERTIFIED_THROUGH:
            continue
        for name, row in json.load(open(path)).items():
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if not ok:
                continue
            out.add(name)
            m = re.match(r"^a0(\d{3}_.*)$", name)
            if m:
                out.add("q" + m.group(1))
    return out


def test_window_is_50_first_time_names():
    reg = load_all()
    window = sorted(reg)[:50]
    spent = _certified_names()
    rehashes = [
        n
        for n in window
        if n in spent
        or ("alias" in reg[n].tags and reg[n].tags[-1] in spent)
    ]
    assert rehashes == [], f"window re-hashes already-certified: {rehashes}"


def test_window_composition():
    reg = load_all()
    window = sorted(reg)[:50]
    aliases = [n for n in window if "alias" in reg[n].tags]
    ops = [n for n in window if "alias" not in reg[n].tags]
    assert len(aliases) == 25 and len(ops) == 25
    for n in aliases:
        orig = reg[n].tags[-1]
        assert orig in reg, f"{n} aliases missing original {orig}"
        assert reg[n].oracle == reg[orig].oracle
        assert reg[n].fn is reg[orig].fn
        assert n == "a0" + orig[1:]


def test_retired_numbers_not_reused():
    reg = load_all()
    retired = (
        {f"a{i:03d}" for i in range(0, 79)}
        | {f"a{i:03d}" for i in range(101, 126)}
        | {"a415", "a416", "a423", "a424"}
    )
    used = {n.split("_")[0] for n in reg if re.match(r"^a\d{3}_", n)}
    assert not (used & retired), sorted(used & retired)
