"""Golden-render regression anchors (VERDICT r4 item 5).

Four fixed-seed renders of the flagship configuration (bf16 feature
pipeline + pack_rgb, the shipped one_shot.yaml semantics) are pinned as
uint8 PNGs in tests/goldens/. The tolerance budget for every documented
quantization (pack_rgb 1/1023, bf16 reassociation) lives in
tests/golden_common.py; a real rendering regression moves whole regions by
tens of uint8 steps and trips this immediately, while the knobs' compound
drift stays in low single digits.

Regenerate after an INTENDED visual change: python -m tests.golden_common --write
"""
import os

import pytest

from tests.golden_common import (MAX_STEP_TOL, MEAN_STEP_TOL, compare_goldens,
                                 golden_path)


@pytest.mark.skipif(not os.path.exists(golden_path("flagship")),
                    reason="goldens not generated")
def test_golden_renders_match():
    deltas = compare_goldens()
    assert set(deltas) == {"flagship", "edit_left_only", "edit_duplication",
                           "orbit_f2"}
    for name, (mx, mean) in deltas.items():
        assert mx <= MAX_STEP_TOL, (
            f"{name}: max delta {mx} uint8 steps > {MAX_STEP_TOL} — a real "
            f"visual change; if intended, regenerate via "
            f"`python -m tests.golden_common --write` and review the diff")
        assert mean <= MEAN_STEP_TOL, (name, mean)
