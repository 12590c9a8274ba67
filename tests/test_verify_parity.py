"""verify_parity: the <1e-4 parity claim as an executable check.

Fixture mode regenerates deterministic manifest-shape weights,
converts them with the real converters, runs OUR generators at
published-checkpoint scale and compares against the checked-in
reference-generated maps (data/assets/parity/<family>.npz) — i.e. a
full converter+model+generator parity run with no reference checkout
needed. Marked slow: these are full-manifest models on CPU.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformer_mm_explainability_tpu.tools import verify_parity as vp


def _families_with_fixtures():
    return [f for f in vp.FAMILIES
            if os.path.exists(vp.fixture_path(f))]


def test_fixtures_checked_in():
    """Every family ships its fixture — a missing npz silently turns
    the one-command claim into a no-op."""
    missing = [f for f in vp.FAMILIES
               if not os.path.exists(vp.fixture_path(f))]
    assert not missing, f"parity fixtures missing for {missing}"


@pytest.mark.slow
@pytest.mark.parametrize("family", _families_with_fixtures())
def test_fixture_verifies(family):
    rep = vp.verify_fixture(family)
    assert rep["ok"], rep


def test_fixture_method_coverage():
    """The multi-method families must keep pinning the full baseline
    surface (ours + transformer_att/partial_lrp/raw_attn/rollout/
    attn_gradcam) — a regenerated fixture that silently drops maps
    would shrink the <1e-4 claim back to one method per family."""
    expected = {
        "visual_bert": {"cls_per_token_score", "transformer_att",
                        "partial_lrp", "raw_attn", "rollout",
                        "attn_gradcam", "scores"},
        "lxmert": ({"R_t_t", "R_t_i", "scores"}
                   | {f"{m}_{s}" for m in ("transformer_att",
                                           "partial_lrp", "raw_attn",
                                           "rollout", "attn_gradcam")
                      for s in ("R_t_t", "R_t_i")}),
        "detr": {"R_q_i", "transformer_att", "partial_lrp", "raw_attn",
                 "rollout", "attn_gradcam"},
    }
    for family, want in expected.items():
        path = vp.fixture_path(family)
        if not os.path.exists(path):
            continue  # test_fixtures_checked_in reports this
        have = {k[4:] for k in np.load(path).files
                if k.startswith("map_")}
        assert want <= have, (family, want - have)


def test_random_state_dict_deterministic():
    man = {"a.weight": (3, 4), "b.bias": (4,)}
    sd1 = vp.random_state_dict(man, seed=7)
    sd2 = vp.random_state_dict(man, seed=7)
    for k in man:
        np.testing.assert_array_equal(sd1[k].numpy(), sd2[k].numpy())
    sd3 = vp.random_state_dict(man, seed=8)
    assert np.abs(sd1["a.weight"].numpy()
                  - sd3["a.weight"].numpy()).max() > 0


def test_cli_surface():
    from transformer_mm_explainability_tpu import cli

    p = cli.build_parser()
    args = p.parse_args(["verify-parity", "--family", "clip"])
    assert args.family == "clip" and not args.generate
    args = p.parse_args(["protocol-rehearsal", "--protocol", "detr"])
    assert args.protocol == "detr"
