"""Scheduler registry parity (C24/C25): our optax-style schedule
factories vs the reference's torch LambdaLR schedulers
(VisualBERT/mmf/modules/schedulers.py) driven step by step."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.core.registry import registry  # noqa: E402
from transformer_mm_explainability_tpu.train import schedulers as S  # noqa: E402


def _torch_lrs(make_sched, steps):
    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = make_sched(opt)
    lrs = []
    for _ in range(steps):
        lrs.append(sched.get_last_lr()[0])
        opt.step()
        sched.step()
    return np.array(lrs)


def test_warmup_linear_parity():
    from transformers.optimization import get_linear_schedule_with_warmup
    want = _torch_lrs(
        lambda o: get_linear_schedule_with_warmup(o, 10, 50), 60)
    sched = S.warmup_linear(10, 50)
    got = np.array([float(sched(i)) for i in range(60)])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_warmup_cosine_parity():
    from transformers.optimization import get_cosine_schedule_with_warmup
    want = _torch_lrs(
        lambda o: get_cosine_schedule_with_warmup(o, 8, 40), 45)
    sched = S.warmup_cosine(8, 40)
    got = np.array([float(sched(i)) for i in range(45)])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("use_warmup", [False, True])
def test_pythia_schedule_vs_bisect_oracle(use_warmup):
    """lr_lambda_update (mmf/utils/general.py:18-24) with
    bisect-right staircase semantics."""
    from bisect import bisect
    lr_steps = [10, 20, 35]
    sched = S.pythia(use_warmup=use_warmup, warmup_iterations=5,
                     warmup_factor=0.25, lr_steps=lr_steps, lr_ratio=0.1)
    for i in range(45):
        if use_warmup and i <= 5:
            want = 0.25 * (1.0 - i / 5.0) + i / 5.0
        else:
            want = 0.1 ** bisect(lr_steps, i)
        assert float(sched(i)) == pytest.approx(want, rel=1e-6), i


def test_multi_step_asserts_warmup_before_first_milestone():
    # the assert only bites when warmup is actually enabled
    with pytest.raises(AssertionError):
        S.multi_step(use_warmup=True, lr_steps=[5], warmup_iterations=10)
    sched = S.multi_step(use_warmup=True, lr_steps=[20], lr_ratio=0.5,
                         warmup_iterations=4, warmup_factor=0.5)
    assert float(sched(0)) == pytest.approx(0.5)
    assert float(sched(30)) == pytest.approx(0.5)


def test_registry_and_adam_w():
    import optax
    for name in ("pythia", "warmup_linear", "warmup_cosine",
                 "multi_step"):
        assert registry.get("scheduler", name) is not None
    tx = registry.get("optimizer", "adam_w")(
        lr=1e-3, schedule=S.warmup_linear(2, 10))
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    updates, _ = tx.update(g, state, params)
    assert jnp.isfinite(updates["w"]).all()


def test_multi_step_no_warmup_early_milestone():
    """Regression: the reference zeroes warmup_iterations when
    use_warmup is False BEFORE the assert (schedulers.py:45-47), so a
    first milestone below the default 1000 is legal."""
    sched = S.multi_step(lr_steps=[500], lr_ratio=0.1)
    assert float(sched(0)) == 1.0
    assert float(sched(600)) == pytest.approx(0.1)
