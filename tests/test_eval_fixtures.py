"""Metric parity against the reference's SHIPPED result files
(EAGLE-3H/results/*) — real data the reference generated on H100/H200
(SURVEY.md §4 'E2E metrics' test plan). Skipped when the reference tree is
not mounted."""
import os

import pytest

from hsd_tpu.eval.eagle_metrics import evaluate_info_file

REF = "/root/reference/EAGLE-3H/results"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference results not mounted")


@pytest.mark.parametrize("sub,be,ds", [
    ("h100_HSD/llama38b2_40-temperature-1.0_ea_hsd_info.jsonl", 3.964, 186.35),
    ("h100_eagle/llama38b2_40-temperature-1.0_ea_info.jsonl", 3.826, 157.76),
])
def test_eagle_fixture_metrics(sub, be, ds):
    m = evaluate_info_file(os.path.join(REF, sub), gamma=7)
    assert m["questions"] == 80
    assert abs(m["block_efficiency"] - be) < 0.01, m
    assert abs(m["decoding_speed"] - ds) < 1.0, m


def test_hsd_beats_eagle_on_fixtures():
    """The headline EAGLE-3H claim (README.md:136-141): HSD verification
    raises block efficiency over EAGLE-3's default, on the reference's own
    recorded runs."""
    for hw in ("h100", "h200"):
        hsd = evaluate_info_file(os.path.join(
            REF, f"{hw}_HSD/llama38b2_40-temperature-1.0_ea_hsd_info.jsonl"))
        base = evaluate_info_file(os.path.join(
            REF, f"{hw}_eagle/llama38b2_40-temperature-1.0_ea_info.jsonl"))
        assert hsd["block_efficiency"] > base["block_efficiency"]
