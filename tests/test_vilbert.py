"""ViLBERT parity (C12): the two-stream co-attentional encoder, poolers
and both heads vs the in-process reference
(VisualBERT/mmf/models/vilbert.py) with shared random weights.

ViLBERTBase is a self-contained BertPreTrainedModel — instantiated
directly with a small BertConfig carrying the v_*/bi_* fields, so the
FULL reference forward (embeddings → interleaved text/image/co-attn
schedule → poolers) runs in-process as the oracle.
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.models import vilbert as jv  # noqa: E402
from transformer_mm_explainability_tpu.utils import convert_mmf as C  # noqa: E402


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_vilbert():
    import torch
    from transformers.models.bert import modeling_bert

    added = []

    def add(name, mod):
        if name in sys.modules:
            return
        sys.modules[name] = mod
        added.append(name)

    for pkg in ("VisualBERT", "VisualBERT.mmf", "VisualBERT.mmf.common",
                "VisualBERT.mmf.models", "VisualBERT.mmf.modules",
                "VisualBERT.mmf.utils"):
        add(pkg, _stub_module(pkg))
    add("VisualBERT.mmf.utils.env",
        _stub_module("VisualBERT.mmf.utils.env",
                     setup_imports=lambda *a, **k: None))
    sys.modules["VisualBERT.mmf.models"].BaseModel = torch.nn.Module
    add("VisualBERT.mmf.models.base_model",
        _stub_module("VisualBERT.mmf.models.base_model",
                     BaseModel=torch.nn.Module))
    add("VisualBERT.mmf.modules.hf_layers",
        _stub_module("VisualBERT.mmf.modules.hf_layers",
                     replace_with_jit=lambda *a, **k: None))
    add("VisualBERT.mmf.utils.configuration",
        _stub_module("VisualBERT.mmf.utils.configuration",
                     get_mmf_cache_dir=lambda: "/tmp"))
    add("omegaconf", _stub_module(
        "omegaconf",
        OmegaConf=types.SimpleNamespace(to_container=lambda c, **k: dict(c))))
    if not hasattr(modeling_bert, "ACT2FN"):
        pytest.skip("transformers modeling_bert lacks ACT2FN")
    add("transformers.modeling_bert", modeling_bert)

    def _load_real(name, relpath):
        spec = importlib.util.spec_from_file_location(
            name, str(REFERENCE / "VisualBERT" / relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        added.append(name)
        spec.loader.exec_module(mod)
        return mod

    try:
        _load_real("VisualBERT.mmf.common.registry",
                   "mmf/common/registry.py")
        _load_real("VisualBERT.mmf.utils.modeling", "mmf/utils/modeling.py")
        mod = _load_real("ref_vilbert_mod", "mmf/models/vilbert.py")
        yield mod
    finally:
        for name in added:
            sys.modules.pop(name, None)


CFG = jv.ViLBERTConfig(
    vocab_size=40, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=24, v_feature_size=12, v_target_size=11,
    v_hidden_size=24, v_num_hidden_layers=2, v_num_attention_heads=4,
    v_intermediate_size=48, bi_hidden_size=16, bi_num_attention_heads=4,
    v_biattention_id=(0, 1), t_biattention_id=(2, 3), num_labels=5,
    training_head_type="vqa2")


def _bert_config(cfg, **over):
    from transformers import BertConfig
    kw = dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_feature_size=cfg.v_feature_size,
        v_target_size=cfg.v_target_size,
        v_hidden_size=cfg.v_hidden_size,
        v_num_hidden_layers=cfg.v_num_hidden_layers,
        v_num_attention_heads=cfg.v_num_attention_heads,
        v_intermediate_size=cfg.v_intermediate_size,
        bi_hidden_size=cfg.bi_hidden_size,
        bi_num_attention_heads=cfg.bi_num_attention_heads,
        v_biattention_id=list(cfg.v_biattention_id),
        t_biattention_id=list(cfg.t_biattention_id),
        v_attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        v_hidden_act="gelu", hidden_act="gelu",
        fusion_method=cfg.fusion_method, fast_mode=False,
        with_coattention=cfg.with_coattention,
        dynamic_attention=cfg.dynamic_attention, in_batch_pairs=False,
        task_specific_tokens=False, fixed_v_layer=cfg.fixed_v_layer,
        fixed_t_layer=cfg.fixed_t_layer, visualization=False,
    )
    kw.update(over)
    return BertConfig(**kw)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _inputs(B=2, T=6, K=4):
    rs = np.random.RandomState(120)
    return {
        "input_txt": rs.randint(0, CFG.vocab_size, (B, T)),
        "image_feature": rand(B, K, CFG.v_feature_size, seed=121),
        "image_location": rand(B, K, 5, seed=122),
        "token_type_ids": np.zeros((B, T), np.int64),
        "attention_mask": np.array([[1] * T, [1, 1, 1, 1, 0, 0]],
                                   np.int64),
        "image_attention_mask": np.array([[1, 1, 1, 1], [1, 1, 0, 0]],
                                         np.int64),
    }


@requires_reference
@pytest.mark.parametrize("dynamic", [False, True])
def test_vilbert_base_parity(ref_vilbert, dynamic):
    import torch
    import dataclasses as dc

    cfg = dc.replace(CFG, dynamic_attention=dynamic)
    torch.manual_seed(30 + int(dynamic))
    base = ref_vilbert.ViLBERTBase(
        _bert_config(cfg, dynamic_attention=dynamic)).eval()
    inp = _inputs()
    seq_t, seq_v, pt, pv, _, _, _ = base(
        torch.tensor(inp["input_txt"]),
        torch.tensor(inp["image_feature"]),
        torch.tensor(inp["image_location"]),
        torch.tensor(inp["token_type_ids"]),
        torch.tensor(inp["attention_mask"]),
        torch.tensor(inp["image_attention_mask"]))

    params = C.vilbert_from_state_dict(base.state_dict(), cfg)
    got_t, got_v, got_pt, got_pv, _ = jv.vilbert_base(
        params, cfg, jnp.asarray(inp["input_txt"]),
        jnp.asarray(inp["image_feature"]),
        jnp.asarray(inp["image_location"]),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        image_attention_mask=jnp.asarray(inp["image_attention_mask"]))
    np.testing.assert_allclose(np.asarray(got_t),
                               seq_t.detach().numpy(), atol=3e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_v),
                               seq_v.detach().numpy(), atol=3e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_pt), pt.detach().numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_pv), pv.detach().numpy(),
                               atol=3e-4, rtol=1e-3)


@requires_reference
def test_vilbert_classification_parity(ref_vilbert):
    """ViLBERTForClassification head (vilbert.py:1383-1401) on the
    fused (mul) pooled pair."""
    import torch
    from transformers.models.bert.modeling_bert import (
        BertPredictionHeadTransform)

    torch.manual_seed(32)
    base = ref_vilbert.ViLBERTBase(_bert_config(CFG)).eval()
    head_cfg = _bert_config(CFG, hidden_size=CFG.bi_hidden_size)
    torch.manual_seed(33)
    classifier = torch.nn.Sequential(
        BertPredictionHeadTransform(head_cfg),
        torch.nn.Linear(CFG.bi_hidden_size, CFG.num_labels)).eval()

    inp = _inputs()
    _, _, pt, pv, _, _, _ = base(
        torch.tensor(inp["input_txt"]),
        torch.tensor(inp["image_feature"]),
        torch.tensor(inp["image_location"]),
        torch.tensor(inp["token_type_ids"]),
        torch.tensor(inp["attention_mask"]),
        torch.tensor(inp["image_attention_mask"]))
    want = classifier(pt * pv).detach().numpy()

    sd = dict(base.state_dict())
    for k, p in classifier.state_dict().items():
        sd[f"classifier.{k}"] = p
    params = C.vilbert_from_state_dict(sd, CFG)
    got = jv.vilbert_for_classification(
        params, CFG, jnp.asarray(inp["input_txt"]),
        jnp.asarray(inp["image_feature"]),
        jnp.asarray(inp["image_location"]),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        image_attention_mask=jnp.asarray(inp["image_attention_mask"]))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-3)


@requires_reference
def test_vilbert_pretraining_heads_parity(ref_vilbert):
    """BertPreTrainingHeads (vilbert.py:926-954) with the LM decoder
    tied to the word embedding."""
    import torch

    torch.manual_seed(34)
    base = ref_vilbert.ViLBERTBase(_bert_config(CFG)).eval()
    torch.manual_seed(35)
    cls = ref_vilbert.BertPreTrainingHeads(_bert_config(CFG)).eval()
    cls.predictions.decoder.weight = base.embeddings.word_embeddings.weight

    inp = _inputs()
    seq_t, seq_v, pt, pv, _, _, _ = base(
        torch.tensor(inp["input_txt"]),
        torch.tensor(inp["image_feature"]),
        torch.tensor(inp["image_location"]),
        torch.tensor(inp["token_type_ids"]),
        torch.tensor(inp["attention_mask"]),
        torch.tensor(inp["image_attention_mask"]))
    want_t, want_v, want_rel = cls(seq_t, seq_v, pt, pv)

    sd = dict(base.state_dict())
    for k, p in cls.state_dict().items():
        sd[f"cls.{k}"] = p
    params = C.vilbert_from_state_dict(sd, CFG)
    got_t2, got_v2, got_pt, got_pv, _ = jv.vilbert_base(
        params, CFG, jnp.asarray(inp["input_txt"]),
        jnp.asarray(inp["image_feature"]),
        jnp.asarray(inp["image_location"]),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        image_attention_mask=jnp.asarray(inp["image_attention_mask"]))
    got_lm, got_img, got_rel = jv.vilbert_pretraining_heads(
        params, CFG, got_t2, got_v2, got_pt, got_pv)
    np.testing.assert_allclose(np.asarray(got_lm),
                               want_t.detach().numpy(), atol=5e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_img),
                               want_v.detach().numpy(), atol=5e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_rel),
                               want_rel.detach().numpy(), atol=5e-4,
                               rtol=1e-3)


@requires_reference
def test_vilbert_pretrain_losses_parity(ref_vilbert):
    """masked-LM CE (ignore −1) and the visual_target=0 KLDiv masked
    region loss (vilbert.py:1163-1307)."""
    import torch

    torch.manual_seed(36)
    base = ref_vilbert.ViLBERTBase(_bert_config(CFG)).eval()
    torch.manual_seed(37)
    cls = ref_vilbert.BertPreTrainingHeads(_bert_config(CFG)).eval()
    cls.predictions.decoder.weight = base.embeddings.word_embeddings.weight

    inp = _inputs()
    rs = np.random.RandomState(123)
    lm_labels = rs.randint(-1, CFG.vocab_size, (2, 6))
    image_label = rs.randint(-1, 2, (2, 4))
    image_label[0, 0] = 1  # at least one masked region
    target = np.abs(rand(2, 4, CFG.v_target_size, seed=124))
    target /= target.sum(-1, keepdims=True)

    seq_t, seq_v, pt, pv, _, _, _ = base(
        torch.tensor(inp["input_txt"]),
        torch.tensor(inp["image_feature"]),
        torch.tensor(inp["image_location"]),
        torch.tensor(inp["token_type_ids"]),
        torch.tensor(inp["attention_mask"]),
        torch.tensor(inp["image_attention_mask"]))
    p_t, p_v, _ = cls(seq_t, seq_v, pt, pv)
    want_lm = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        p_t.view(-1, CFG.vocab_size),
        torch.tensor(lm_labels).view(-1)).item()
    kld = torch.nn.KLDivLoss(reduction="none")(
        torch.log_softmax(p_v, dim=2), torch.tensor(target))
    lbl = torch.tensor(image_label)
    want_img = (torch.sum(kld * torch.eq(lbl, 1).unsqueeze(2).float())
                / max(torch.sum(torch.eq(lbl, 1)).item(), 1)).item()

    sd = dict(base.state_dict())
    for k, p in cls.state_dict().items():
        sd[f"cls.{k}"] = p
    params = C.vilbert_from_state_dict(sd, CFG)
    losses = jv.vilbert_pretrain_losses(
        params, CFG, jnp.asarray(inp["input_txt"]),
        jnp.asarray(inp["image_feature"]),
        jnp.asarray(inp["image_location"]),
        masked_lm_labels=jnp.asarray(lm_labels),
        image_label=jnp.asarray(image_label),
        image_target=jnp.asarray(target),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        image_attention_mask=jnp.asarray(inp["image_attention_mask"]))
    np.testing.assert_allclose(float(losses["masked_lm_loss"]), want_lm,
                               atol=1e-4)
    np.testing.assert_allclose(float(losses["masked_img_loss"]), want_img,
                               atol=1e-4)


def test_vilbert_collect_attn_shapes():
    """The functional attention taps: text/image/co stacks have the
    schedule's layer counts and softmax rows sum to 1."""
    params = jv.init_vilbert(jax.random.PRNGKey(0), CFG)
    inp = _inputs()
    _, _, _, _, (at, av, ac) = jv.vilbert_base(
        params, CFG, jnp.asarray(inp["input_txt"]),
        jnp.asarray(inp["image_feature"]),
        jnp.asarray(inp["image_location"]), collect_attn=True)
    assert len(at) == CFG.num_hidden_layers
    assert len(av) == CFG.v_num_hidden_layers
    assert len(ac) == len(CFG.v_biattention_id)
    np.testing.assert_allclose(np.asarray(at[0].sum(-1)), 1.0, atol=1e-5)
    # co-attention: (text-query over image keys, image-query over text)
    p1, p2 = ac[0]
    assert p1.shape[-1] == inp["image_feature"].shape[1]
    assert p2.shape[-1] == inp["input_txt"].shape[1]
