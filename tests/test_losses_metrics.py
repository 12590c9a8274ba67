"""Loss + metric registry parity (C24/C28/C34) vs the in-process torch
reference: VisualBERT/mmf/modules/losses.py, mmf/modules/metrics.py and
mmf/utils/m4c_evaluators.py, loaded with their import chain satisfied
and driven on the same random tensors."""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.core import losses as JL  # noqa: E402
from transformer_mm_explainability_tpu.core import metrics as JM  # noqa: E402
from transformer_mm_explainability_tpu.utils import m4c_evaluators as JE  # noqa: E402


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _load_real(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, str(REFERENCE / "VisualBERT" / relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class DictObj(dict):
    """dict with attribute access — stands in for SampleList."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


def _brute_levenshtein(a, b):
    """Independent O(3^n) oracle for tiny strings."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    return min(_brute_levenshtein(a[1:], b) + 1,
               _brute_levenshtein(a, b[1:]) + 1,
               _brute_levenshtein(a[1:], b[1:]) + (a[0] != b[0]))


@pytest.fixture(scope="module")
def ref(request):
    """Load the real mmf losses/metrics/m4c_evaluators with stubs for
    the heavy leaves (processors, editdistance)."""
    import torch  # noqa: F401

    added = []

    def add(name, mod):
        assert name not in sys.modules, name
        sys.modules[name] = mod
        added.append(name)

    for pkg in ("VisualBERT", "VisualBERT.mmf", "VisualBERT.mmf.common",
                "VisualBERT.mmf.modules", "VisualBERT.mmf.utils",
                "VisualBERT.mmf.datasets",
                "VisualBERT.mmf.datasets.processors"):
        add(pkg, _stub_module(pkg))
    add("VisualBERT.mmf.utils.env",
        _stub_module("VisualBERT.mmf.utils.env",
                     setup_imports=lambda *a, **k: None))
    if "editdistance" not in sys.modules:
        add("editdistance",
            _stub_module("editdistance", eval=_brute_levenshtein))

    registry_mod = _load_real("VisualBERT.mmf.common.registry",
                              "mmf/common/registry.py")
    added.append("VisualBERT.mmf.common.registry")
    evaluators = _load_real("VisualBERT.mmf.utils.m4c_evaluators",
                            "mmf/utils/m4c_evaluators.py")
    added.append("VisualBERT.mmf.utils.m4c_evaluators")
    # metrics.py imports EvalAIAnswerProcessor from the processors
    # module; the real one lives in m4c_evaluators too
    add("VisualBERT.mmf.datasets.processors.processors",
        _stub_module("VisualBERT.mmf.datasets.processors.processors",
                     EvalAIAnswerProcessor=evaluators.EvalAIAnswerProcessor))
    losses = _load_real("VisualBERT.mmf.modules.losses",
                        "mmf/modules/losses.py")
    added.append("VisualBERT.mmf.modules.losses")
    metrics = _load_real("VisualBERT.mmf.modules.metrics",
                         "mmf/modules/metrics.py")
    added.append("VisualBERT.mmf.modules.metrics")

    ns = types.SimpleNamespace(losses=losses, metrics=metrics,
                               evaluators=evaluators,
                               registry=registry_mod.registry)

    def cleanup():
        for name in added:
            sys.modules.pop(name, None)

    request.addfinalizer(cleanup)
    return ns


def rand(*shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale
            ).astype(np.float32)


def soft_targets(b, c, seed=1):
    rs = np.random.RandomState(seed)
    t = rs.rand(b, c).astype(np.float32) * (rs.rand(b, c) > 0.6)
    return t


def _sl(**kw):
    d = DictObj(kw)
    d.setdefault("dataset_type", "val")
    d.setdefault("dataset_name", "vqa2")
    return d


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

@requires_reference
@pytest.mark.parametrize("name", [
    "logit_bce", "triple_logit_bce", "bce", "nll_loss", "weighted_softmax",
    "softmax_kldiv", "wrong", "cross_entropy"])
def test_loss_parity_simple(ref, name):
    import torch
    B, C = 6, 11
    scores = rand(B, C, seed=3, scale=2.0)
    if name == "bce":
        scores = 1.0 / (1.0 + np.exp(-scores))  # probabilities
    if name == "nll_loss":
        scores = np.log(np.maximum(
            np.exp(scores) / np.exp(scores).sum(1, keepdims=True), 1e-9))
    targets = soft_targets(B, C, seed=4)
    if name == "cross_entropy":
        targets_t = torch.tensor(
            np.random.RandomState(5).randint(0, C, (B,)))
        targets_j = jnp.asarray(targets_t.numpy())
    else:
        targets_t = torch.tensor(targets.copy())
        targets_j = jnp.asarray(targets)

    cls = ref.registry.get_loss_class(name)
    want = cls()(_sl(targets=targets_t),
                 {"scores": torch.tensor(scores.copy())})
    got = JL.__dict__[name]({"targets": targets_j},
                            {"scores": jnp.asarray(scores)})
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-5, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("dims", [2, 3])
def test_triple_logit_bce_branches(ref, dims):
    import torch
    B, C = 4, 7
    shape = (B, 3, C) if dims == 3 else (B, C)
    scores = rand(*shape, seed=6, scale=2.0)
    targets = soft_targets(B, C, seed=7)
    cls = ref.registry.get_loss_class("triple_logit_bce")
    want = cls()(_sl(targets=torch.tensor(targets.copy())),
                 {"scores": torch.tensor(scores.copy())})
    got = JL.triple_logit_bce({"targets": jnp.asarray(targets)},
                              {"scores": jnp.asarray(scores)})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)


@requires_reference
@pytest.mark.parametrize("with_len", [False, True])
def test_caption_cross_entropy_parity(ref, with_len):
    import torch
    B, T, V = 4, 6, 13
    scores = rand(B, T, V, seed=8, scale=2.0)
    targets = np.random.RandomState(9).randint(0, V, (B, T))
    sl = _sl(targets=torch.tensor(targets))
    ours_sl = {"targets": jnp.asarray(targets)}
    if with_len:
        lens = np.array([6, 4, 5, 3], np.int64)
        sl["caption_len"] = torch.tensor(lens)
        ours_sl["caption_len"] = jnp.asarray(lens)
    cls = ref.registry.get_loss_class("caption_cross_entropy")
    want = cls()(sl, {"scores": torch.tensor(scores.copy())})
    got = JL.caption_cross_entropy(ours_sl, {"scores": jnp.asarray(scores)})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)


@requires_reference
def test_bce_kl_combined_and_m4c_mask_parity(ref):
    import torch
    B, C = 5, 9
    scores = rand(B, C, seed=10, scale=2.0)
    targets = soft_targets(B, C, seed=11)
    cls = ref.registry.get_loss_class("bce_kl_combined")
    want = cls(weight_softmax=0.3)(
        _sl(targets=torch.tensor(targets.copy())),
        {"scores": torch.tensor(scores.copy())})
    got = JL.bce_kl_combined({"targets": jnp.asarray(targets)},
                             {"scores": jnp.asarray(scores)},
                             weight_softmax=0.3)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)

    T = 4
    scores3 = rand(B, T, C, seed=12, scale=2.0)
    targets3 = (np.random.RandomState(13).rand(B, T, C) > 0.7
                ).astype(np.float32)
    mask = (np.random.RandomState(14).rand(B, T) > 0.3).astype(np.float32)
    cls = ref.registry.get_loss_class("m4c_decoding_bce_with_mask")
    want = cls()(_sl(targets=torch.tensor(targets3),
                     train_loss_mask=torch.tensor(mask)),
                 {"scores": torch.tensor(scores3.copy())})
    got = JL.m4c_decoding_bce_with_mask(
        {"targets": jnp.asarray(targets3),
         "train_loss_mask": jnp.asarray(mask)},
        {"scores": jnp.asarray(scores3)})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)


@requires_reference
def test_attention_supervision_parity(ref):
    import torch
    B, N, M = 3, 5, 7
    attn = 1.0 / (1.0 + np.exp(-rand(B, N, M, seed=15)))
    sup = (np.random.RandomState(16).rand(B, N, M) > 0.5).astype(np.int64)
    cls = ref.registry.get_loss_class("attention_supervision")
    want = cls()(_sl(info={"attention_supervision":
                           torch.tensor(sup)}),
                 {"attentions": [torch.tensor(attn.copy())]})
    got = JL.attention_supervision(
        {"info": {"attention_supervision": jnp.asarray(sup)}},
        {"attentions": [jnp.asarray(attn)]})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)


@requires_reference
def test_multi_loss_and_losses_orchestration(ref):
    import torch
    B, C = 4, 8
    scores = rand(B, C, seed=17, scale=2.0)
    targets = soft_targets(B, C, seed=18)
    spec = {"type": "multi", "params": [
        {"type": "logit_bce", "weight": 0.3, "params": {}},
        {"type": "softmax_kldiv", "weight": 0.7, "params": {}}]}
    # The reference MultiLoss is broken as shipped: it multiplies the
    # weight by the DICT MMFLoss returns (losses.py:412-413) — pin it.
    with pytest.raises(TypeError):
        ref.losses.MultiLoss(spec)(
            _sl(targets=torch.tensor(targets.copy())),
            {"scores": torch.tensor(scores.copy())})
    # ours implements the documented intent: weighted sum of sub-losses
    sl = {"targets": jnp.asarray(targets), "dataset_type": "train",
          "dataset_name": "vqa2"}
    mo = {"scores": jnp.asarray(scores)}
    got_d = JL.Losses([spec])(sl, mo)
    (key,) = got_d.keys()
    assert key == "train/vqa2/multi"
    want = 0.3 * JL.logit_bce(sl, mo) + 0.7 * JL.softmax_kldiv(sl, mo)
    np.testing.assert_allclose(np.asarray(got_d[key][0]),
                               np.asarray(want), rtol=1e-6)
    # no targets → empty dict, matching Losses.forward (:96-103)
    assert JL.Losses(["logit_bce"])({}, {"scores": jnp.asarray(scores)}) \
        == {}


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def _ref_metric(ref, name, sl, mo, **params):
    cls = ref.registry.get_metric_class(name)
    return float(cls(**params).calculate(sl, mo))


@requires_reference
def test_accuracy_and_vqa_accuracy_parity(ref):
    import torch
    B, C = 8, 10
    scores = rand(B, C, seed=20, scale=2.0)
    targets = soft_targets(B, C, seed=21)
    labels = np.random.RandomState(22).randint(0, C, (B,))

    want = _ref_metric(ref, "accuracy", _sl(targets=torch.tensor(labels)),
                       {"scores": torch.tensor(scores.copy())})
    got = JM.compute("accuracy", jnp.asarray(scores), jnp.asarray(labels))
    assert got == pytest.approx(want)

    want = _ref_metric(ref, "vqa_accuracy",
                       _sl(targets=torch.tensor(targets.copy())),
                       {"scores": torch.tensor(scores.copy())})
    got = JM.compute("vqa_accuracy", jnp.asarray(scores),
                     jnp.asarray(targets))
    assert got == pytest.approx(want, abs=1e-6)

    # three-branch (movie+mcan) scores
    scores3 = rand(B, 3, C, seed=23, scale=2.0)
    want = _ref_metric(ref, "vqa_accuracy",
                       _sl(targets=torch.tensor(targets.copy())),
                       {"scores": torch.tensor(scores3.copy())})
    got = JM.compute("vqa_accuracy", jnp.asarray(scores3),
                     jnp.asarray(targets))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("name", ["r@1", "r@5", "r@10", "mean_r",
                                  "mean_rr"])
def test_rank_metrics_vs_numpy_oracle(name):
    """The reference rank metrics are dead code as shipped —
    RecallAt{1,5,10}.calculate recurses into itself
    (metrics.py:490-502) and RecallAtK.get_ranks calls an undefined
    ``process_ranks`` (metrics.py:469) — so the oracle here is the
    documented rank definition (descending-score 1-based rank of the
    ground-truth candidate), computed independently in numpy."""
    B, C = 6, 100  # the VisDial protocol width score_to_ranks hard-codes
    scores = rand(B, C, seed=24, scale=2.0)
    gt = np.random.RandomState(25).randint(0, C, (B,))
    targets = np.zeros((B, C), np.float32)
    targets[np.arange(B), gt] = 1.0
    order = np.argsort(-scores, axis=1)
    ranks = np.array([int(np.where(order[b] == gt[b])[0][0]) + 1
                      for b in range(B)], np.float64)
    want = {"r@1": (ranks <= 1).mean(), "r@5": (ranks <= 5).mean(),
            "r@10": (ranks <= 10).mean(), "mean_r": ranks.mean(),
            "mean_rr": (1.0 / ranks).mean()}[name]
    got = JM.compute(name, jnp.asarray(scores), jnp.asarray(targets))
    assert got == pytest.approx(want, rel=1e-6)


@requires_reference
def test_reference_rank_metrics_are_broken(ref):
    """Pin the reference breakage the docstring above relies on."""
    import torch
    sl = _sl(targets=torch.zeros(2, 100))
    mo = {"scores": torch.zeros(2, 100)}
    with pytest.raises(RecursionError):
        _ref_metric(ref, "r@1", sl, mo)
    with pytest.raises(AttributeError, match="process_ranks"):
        _ref_metric(ref, "mean_r", sl, mo)


@requires_reference
@pytest.mark.parametrize("name,params", [
    ("f1", {"average": "macro"}), ("macro_f1", {}), ("micro_f1", {}),
    ("binary_f1", {}),
    ("multilabel_f1", {"average": "weighted"}),
    ("multilabel_micro_f1", {}), ("multilabel_macro_f1", {}),
    ("roc_auc", {}), ("micro_roc_auc", {}), ("macro_roc_auc", {}),
    ("ap", {}), ("micro_ap", {}), ("macro_ap", {}), ("binary_ap", {}),
    ("r@pk", {"p_threshold": 60}),
])
def test_sklearn_family_parity(ref, name, params):
    import torch
    B = 24
    C = 2 if name in ("binary_f1", "binary_ap", "r@pk") else 5
    scores = rand(B, C, seed=26, scale=2.0)
    labels = np.random.RandomState(27).randint(0, C, (B,))
    if name.startswith("multilabel"):
        targets = (np.random.RandomState(28).rand(B, C) > 0.5
                   ).astype(np.float32)
    else:
        targets = labels
    want = _ref_metric(ref, name, _sl(targets=torch.tensor(targets)),
                       {"scores": torch.tensor(scores.copy())}, **params)
    got = JM.compute(name, jnp.asarray(scores), jnp.asarray(targets),
                     **params)
    assert got == pytest.approx(want, abs=1e-6)


@requires_reference
def test_caption_bleu4_parity(ref):
    import torch
    # tiny id→word captions; processor maps ids to tokens, dropping 0s
    vocab = ["<pad>", "a", "cat", "sat", "on", "the", "mat", "dog"]

    class Proc:
        def __call__(self, ids):
            toks = [vocab[i] for i in ids if i != 0]
            return {"tokens": toks}

    ref.registry.register("coco_caption_processor", Proc())
    try:
        answers = np.array([[[1, 2, 3, 4, 5, 6], [1, 7, 3, 0, 0, 0]],
                            [[5, 7, 3, 4, 5, 6], [1, 2, 0, 0, 0, 0]]])
        scores = rand(2, 6, len(vocab), seed=29, scale=2.0)
        want = _ref_metric(
            ref, "caption_bleu4",
            _sl(answers=torch.tensor(answers)),
            {"scores": torch.tensor(scores.copy())})
        got = float(JM.caption_bleu4({"answers": answers},
                                     {"scores": jnp.asarray(scores)},
                                     caption_processor=Proc()))
        assert got == pytest.approx(want, abs=1e-9)
    finally:
        ref.registry.mapping["state"].pop("coco_caption_processor", None)


# ---------------------------------------------------------------------------
# m4c evaluators + EvalAI processor
# ---------------------------------------------------------------------------

@requires_reference
def test_evalai_processor_parity(ref):
    cases = ["Two, dogs?", "an apple; a day", "it's 3.50 dollars",
             "one hundred", "  YALL aint ready ", "semi-colon;test",
             "1,000,000 things", "he's (not) here"]
    ours = JE.EvalAIAnswerProcessor()
    theirs = ref.evaluators.EvalAIAnswerProcessor()
    for s in cases:
        assert ours(s) == theirs(s), s


def test_levenshtein_vs_bruteforce():
    rs = np.random.RandomState(31)
    for _ in range(30):
        a = "".join(rs.choice(list("abcd"), rs.randint(0, 7)))
        b = "".join(rs.choice(list("abcd"), rs.randint(0, 7)))
        assert JE.levenshtein(a, b) == _brute_levenshtein(a, b)


@requires_reference
def test_m4c_evaluator_parity(ref):
    preds = [
        {"pred_answer": "two dogs",
         "gt_answers": ["two dogs", "2 dogs", "two dogs", "dogs",
                        "two dogs", "a dog", "2 dogs", "two dogs",
                        "dogs", "two dogs"]},
        {"pred_answer": "blue",
         "gt_answers": ["red", "green", "blue", "blue", "red", "red",
                        "green", "blue", "red", "red"]},
    ]
    want = ref.evaluators.TextVQAAccuracyEvaluator().eval_pred_list(preds)
    got = JE.TextVQAAccuracyEvaluator().eval_pred_list(preds)
    assert got == pytest.approx(want)

    st_preds = [{"pred_answer": p["pred_answer"],
                 "gt_answers": p["gt_answers"][:4]} for p in preds]
    want = ref.evaluators.STVQAAccuracyEvaluator().eval_pred_list(st_preds)
    got = JE.STVQAAccuracyEvaluator().eval_pred_list(st_preds)
    assert got == pytest.approx(want)

    want = ref.evaluators.STVQAANLSEvaluator().eval_pred_list(st_preds)
    got = JE.STVQAANLSEvaluator().eval_pred_list(st_preds)
    assert got == pytest.approx(want)


def test_corpus_bleu4_vs_nltk():
    import nltk.translate.bleu_score as bleu
    refs = [[["a", "cat", "sat", "on", "the", "mat"],
             ["a", "cat", "is", "on", "a", "mat"]],
            [["the", "dog", "runs", "fast"],
             ["a", "dog", "is", "running"]]]
    hyps = [["a", "cat", "sat", "on", "a", "mat"],
            ["the", "dog", "runs", "fast", "now"]]
    want = bleu.corpus_bleu(refs, hyps)
    got = JE.corpus_bleu4(refs, hyps)
    assert got == pytest.approx(want, abs=1e-6)
    # perfect match (≥4 tokens so 4-grams exist) → 1.0
    assert JE.TextCapsBleu4Evaluator().eval_pred_list(
        [{"pred_answer": "a cat sat down",
          "gt_answers": ["a cat sat down"]}]
    ) == pytest.approx(1.0, abs=1e-6)


def test_metrics_orchestrator_keys():
    scores = jnp.asarray(rand(4, 6, seed=33))
    targets = jnp.asarray(np.random.RandomState(34).randint(0, 6, (4,)))
    m = JM.Metrics(["accuracy", {"type": "top_k_accuracy",
                                 "key": "top2", "params": {"k": 2}}])
    out = m({"targets": targets, "dataset_type": "val",
             "dataset_name": "vqa2"}, {"scores": scores})
    assert set(out) == {"val/vqa2/accuracy", "val/vqa2/top2"}
    with pytest.raises(RuntimeError):
        JM.Metrics(["accuracy", "accuracy"])


def test_build_m4c_predictions():
    vocab = {0: "<pad>", 1: "<eos>", 2: "yes", 3: "no"}
    preds = JM.build_m4c_predictions(
        pred_ids=[[2, 1, 3], [4, 2, 1]],
        context_tokens=[["street"], ["Sign"]],
        gt_answers=[["yes"], ["sign yes"]],
        idx2word=lambda i: vocab[i], eos_idx=1, answer_space_size=4)
    assert preds[0]["pred_answer"] == "yes"
    assert preds[1]["pred_answer"] == "sign yes"
