"""TER analog vs the reference's ACTUAL scorer — `tercom.7.25.jar`
(`webnlg_eval_scripts/calculate_bleu_dev_local.sh:18-20` invokes it;
`webnlg_eval_scripts/metrics.py` prepares its inputs).

`_ter_shifted_edits` documents its deviations from tercom (insertion
points, shift-distance cap, alignment precondition —
`operators/evalmetrics.py`); this module closes that gap WITH DATA by
fuzzing seeded hyp/ref families through the real jar and pinning the
measured agreement:

  * exact-agreement families (identical / substitution-only /
    single-block-shift): our edit counts equal tercom's NumEr on every
    segment — pinned exactly;
  * divergent families (shift+sub compounds, scrambles): agreement
    ≥ 85%, |diff| ≤ 2 edits, and where shift+sub diverges OUR count is
    lower (uncapped shift distance finds moves tercom's pruning skips)
    — pinned directionally.

Full sweep (720 segments, seed 20260817, this box): 683/720 = 94.9%
exact, max |diff| 2 — the per-family table lives in BENCH.md ("TER
analog vs tercom parity"). Skipped cleanly when the jar or a JVM is
absent: the analog's own 3-family provable oracle
(tests/test_evalmetrics.py) still gates the algorithm.
"""

from __future__ import annotations

import random
import re
import shutil
import subprocess

import pytest

from rdf_to_text_spark.operators.evalmetrics import _ter_shifted_edits

JAR = "/root/reference/webnlg_eval_scripts/tercom.7.25.jar"
VOCAB = [f"w{i}" for i in range(40)]

pytestmark = pytest.mark.skipif(
    shutil.which("java") is None or not __import__("os").path.exists(JAR),
    reason="tercom jar or JVM unavailable",
)


def _make_pair(rng: random.Random, family: str) -> tuple[str, str]:
    n = rng.randint(3, 14)
    ref = [rng.choice(VOCAB) for _ in range(n)]
    hyp = list(ref)
    if family == "subs":
        for _ in range(rng.randint(1, 3)):
            hyp[rng.randrange(len(hyp))] = rng.choice(VOCAB)
    elif family == "oneshift":
        ln = rng.randint(1, min(4, len(hyp) - 1))
        i = rng.randrange(len(hyp) - ln + 1)
        block = hyp[i : i + ln]
        rest = hyp[:i] + hyp[i + ln :]
        j = rng.randrange(len(rest) + 1)
        hyp = rest[:j] + block + rest[j:]
    elif family == "shift_sub":
        ln = rng.randint(1, min(3, len(hyp) - 1))
        i = rng.randrange(len(hyp) - ln + 1)
        block = hyp[i : i + ln]
        rest = hyp[:i] + hyp[i + ln :]
        j = rng.randrange(len(rest) + 1)
        hyp = rest[:j] + block + rest[j:]
        hyp[rng.randrange(len(hyp))] = rng.choice(VOCAB)
    elif family == "scramble":
        rng.shuffle(hyp)
        for _ in range(rng.randint(0, 2)):
            hyp[rng.randrange(len(hyp))] = rng.choice(VOCAB)
    return " ".join(hyp), " ".join(ref)


def _tercom_edits(pairs: list[tuple[str, str]], tmp) -> list[float]:
    """One jar invocation for the whole batch → per-segment NumEr."""
    ref_f, hyp_f = tmp / "ref.txt", tmp / "hyp.txt"
    ref_f.write_text(
        "".join(f"{r} (s{k})\n" for k, (_, r) in enumerate(pairs))
    )
    hyp_f.write_text(
        "".join(f"{h} (s{k})\n" for k, (h, _) in enumerate(pairs))
    )
    subprocess.run(
        ["java", "-jar", JAR, "-r", str(ref_f), "-h", str(hyp_f),
         "-n", str(tmp / "out"), "-o", "sum"],
        check=True, capture_output=True,
    )
    edits: dict[int, float] = {}
    for line in (tmp / "out.sum").read_text().splitlines():
        m = re.match(r"s(\d+):1\s*\|", line)
        if m:
            edits[int(m.group(1))] = float(line.split("|")[6].strip())
    return [edits[k] for k in range(len(pairs))]


def test_exact_families_match_tercom(tmp_path):
    """identical / subs / oneshift: 120/120 exact in the full sweep —
    regression-pinned here at 90 segments, one jar call."""
    rng = random.Random(20260817)
    identical = [_make_pair(rng, "subs")[1] for _ in range(10)]
    pairs = (
        [(r, r) for r in identical]
        + [_make_pair(rng, "subs") for _ in range(40)]
        + [_make_pair(rng, "oneshift") for _ in range(40)]
    )
    terc = _tercom_edits(pairs, tmp_path)
    for (h, r), te in zip(pairs, terc):
        mine = _ter_shifted_edits(h.split(), r.split())
        assert mine == te, (h, r, mine, te)


def test_divergent_families_bounded(tmp_path):
    """shift_sub + scramble: divergence is BOUNDED (|diff| ≤ 2 edits on
    every segment) and on shift+sub compounds never in tercom's favor
    (our uncapped shift distance finds moves its pruning skips; the
    ours>tercom cases are all full scrambles, where tercom's
    intermediate insertion points pay off). Measured on this seed:
    63/80 exact, 8 ours-lower, 9 ours-higher (all scramble)."""
    rng = random.Random(20260818)
    fams = [_make_pair(rng, "shift_sub") for _ in range(40)] + [
        _make_pair(rng, "scramble") for _ in range(40)
    ]
    terc = _tercom_edits(fams, tmp_path)
    agree = 0
    shift_sub_higher = 0
    for k, ((h, r), te) in enumerate(zip(fams, terc)):
        mine = _ter_shifted_edits(h.split(), r.split())
        assert abs(mine - te) <= 2, (h, r, mine, te)
        if mine == te:
            agree += 1
        elif k < 40 and mine > te:
            shift_sub_higher += 1
    assert agree >= 60, agree  # 63 measured; headroom for jar drift only
    assert shift_sub_higher == 0  # on compounds we never do WORSE
