"""MMBT parity (C34): ModalEmbeddings / MMBTModel / classification and
pretraining heads vs the in-process reference
(VisualBERT/mmf/models/mmbt.py) with shared random weights.

The reference's MMBTModel/ModalEmbeddings classes are self-contained
(vendored from HF transformers 2.3, mmbt.py:57-313) — they are loaded
and instantiated directly with a modern ``BertModel`` as the
transformer and an Identity modal encoder (the direct-features path).
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

from transformer_mm_explainability_tpu.models import mmbt as jmmbt  # noqa: E402
from transformer_mm_explainability_tpu.utils import convert_mmf as C  # noqa: E402


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_mmbt():
    import torch
    from transformers.models.bert import modeling_bert

    added = []

    def add(name, mod):
        if name in sys.modules:
            return
        sys.modules[name] = mod
        added.append(name)

    for pkg in ("VisualBERT", "VisualBERT.mmf", "VisualBERT.mmf.common",
                "VisualBERT.mmf.models", "VisualBERT.mmf.models.interfaces",
                "VisualBERT.mmf.modules", "VisualBERT.mmf.utils"):
        add(pkg, _stub_module(pkg))
    add("VisualBERT.mmf.utils.env",
        _stub_module("VisualBERT.mmf.utils.env",
                     setup_imports=lambda *a, **k: None))

    class _BaseModel(torch.nn.Module):
        def __init__(self, config=None):
            super().__init__()
            self.config = config

        class Config:
            pass

    add("VisualBERT.mmf.models.base_model",
        _stub_module("VisualBERT.mmf.models.base_model",
                     BaseModel=_BaseModel))
    add("VisualBERT.mmf.models.interfaces.mmbt",
        _stub_module("VisualBERT.mmf.models.interfaces.mmbt",
                     MMBTGridHMInterface=object))

    class _EncCfg:
        def __init__(self, **kw):
            pass

    enc_stub = _stub_module(
        "VisualBERT.mmf.modules.encoders",
        EncoderFactory=type("EncoderFactory", (),
                            {"Config": _EncCfg}),
        ImageEncoderFactory=type("ImageEncoderFactory", (),
                                 {"Config": _EncCfg}),
        ImageEncoderTypes=types.SimpleNamespace(resnet152="resnet152"),
        MultiModalEncoderBase=torch.nn.Module,
        ResNet152ImageEncoder=type("ResNet152ImageEncoder", (),
                                   {"Config": _EncCfg}),
        TextEncoderFactory=type("TextEncoderFactory", (),
                                {"Config": _EncCfg}),
        TextEncoderTypes=types.SimpleNamespace(transformer="transformer"),
        TransformerEncoder=type("TransformerEncoder", (),
                                {"Config": _EncCfg}),
    )
    add("VisualBERT.mmf.modules.encoders", enc_stub)
    add("VisualBERT.mmf.modules.hf_layers",
        _stub_module("VisualBERT.mmf.modules.hf_layers",
                     replace_with_jit=lambda *a, **k: None))
    add("VisualBERT.mmf.utils.checkpoint",
        _stub_module("VisualBERT.mmf.utils.checkpoint",
                     load_pretrained_model=lambda *a, **k: None))
    add("VisualBERT.mmf.utils.configuration",
        _stub_module("VisualBERT.mmf.utils.configuration",
                     get_mmf_cache_dir=lambda: "/tmp"))
    add("VisualBERT.mmf.utils.modeling",
        _stub_module("VisualBERT.mmf.utils.modeling",
                     get_optimizer_parameters_for_bert=lambda *a: []))
    add("omegaconf", _stub_module(
        "omegaconf", II=lambda s: s, DictConfig=dict,
        OmegaConf=types.SimpleNamespace(set_struct=lambda *a: None)))
    add("transformers.modeling_bert", modeling_bert)

    reg_spec = importlib.util.spec_from_file_location(
        "VisualBERT.mmf.common.registry",
        str(REFERENCE / "VisualBERT/mmf/common/registry.py"))
    reg = importlib.util.module_from_spec(reg_spec)
    add("VisualBERT.mmf.common.registry", reg)
    reg_spec.loader.exec_module(reg)

    spec = importlib.util.spec_from_file_location(
        "ref_mmbt_mod", str(REFERENCE / "VisualBERT/mmf/models/mmbt.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mmbt_mod"] = mod
    added.append("ref_mmbt_mod")
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in added:
            sys.modules.pop(name, None)


CFG = jmmbt.MMBTConfig(vocab_size=40, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, modal_hidden_size=12,
                       num_labels=3, max_position_embeddings=32)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _build_ref(ref_mmbt, seed=0):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    bert_cfg = BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=4 * CFG.hidden_size,
        max_position_embeddings=CFG.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    transformer = BertModel(bert_cfg).eval()
    mmbt_cfg = ref_mmbt.MMBTConfig(bert_cfg, num_labels=CFG.num_labels,
                                   modal_hidden_size=CFG.modal_hidden_size)
    model = ref_mmbt.MMBTModel(mmbt_cfg, transformer,
                               torch.nn.Identity()).eval()
    return model, bert_cfg


def _inputs(B=2, N=3, T=5):
    rs = np.random.RandomState(80)
    return {
        "input_modal": rand(B, N, CFG.modal_hidden_size, seed=81),
        "input_ids": rs.randint(0, CFG.vocab_size, (B, T)),
        "attention_mask": np.array([[1] * 5, [1, 1, 1, 0, 0]], np.int64),
        "token_type_ids": np.zeros((B, T), np.int64),
        "start": rs.randint(0, CFG.vocab_size, (B,)),
        "end": rs.randint(0, CFG.vocab_size, (B,)),
    }


@requires_reference
def test_mmbt_model_parity(ref_mmbt):
    import torch
    model, _ = _build_ref(ref_mmbt)
    inp = _inputs()
    seq, pooled, _ = model(
        torch.tensor(inp["input_modal"]),
        torch.tensor(inp["input_ids"]),
        modal_start_tokens=torch.tensor(inp["start"]),
        modal_end_tokens=torch.tensor(inp["end"]),
        attention_mask=torch.tensor(inp["attention_mask"]),
        token_type_ids=torch.tensor(inp["token_type_ids"]))

    params = C.mmbt_from_state_dict(model.state_dict(), CFG)
    got_seq, got_pooled = jmmbt.mmbt_encode(
        params, CFG,
        input_modal=jnp.asarray(inp["input_modal"]),
        input_ids=jnp.asarray(inp["input_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        modal_start_token=jnp.asarray(inp["start"]),
        modal_end_token=jnp.asarray(inp["end"]))
    np.testing.assert_allclose(np.asarray(got_seq),
                               seq.detach().numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_pooled),
                               pooled.detach().numpy(), atol=2e-4,
                               rtol=1e-3)


@requires_reference
def test_mmbt_classification_parity(ref_mmbt):
    """MMBTForClassification head (mmbt.py:524-553) on the pooled out."""
    import torch
    from transformers.models.bert.modeling_bert import (
        BertPredictionHeadTransform)

    model, bert_cfg = _build_ref(ref_mmbt, seed=1)
    torch.manual_seed(2)
    classifier = torch.nn.Sequential(
        BertPredictionHeadTransform(bert_cfg),
        torch.nn.Linear(CFG.hidden_size, CFG.num_labels)).eval()
    inp = _inputs()
    _, pooled, _ = model(
        torch.tensor(inp["input_modal"]), torch.tensor(inp["input_ids"]),
        modal_start_tokens=torch.tensor(inp["start"]),
        modal_end_tokens=torch.tensor(inp["end"]),
        attention_mask=torch.tensor(inp["attention_mask"]),
        token_type_ids=torch.tensor(inp["token_type_ids"]))
    want = classifier(pooled).detach().numpy()

    sd = dict(model.state_dict())
    for k, p in classifier.state_dict().items():
        sd[f"classifier.{k}"] = p
    params = C.mmbt_from_state_dict(sd, CFG)
    got = jmmbt.mmbt_for_classification(
        params, CFG,
        input_modal=jnp.asarray(inp["input_modal"]),
        input_ids=jnp.asarray(inp["input_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        modal_start_token=jnp.asarray(inp["start"]),
        modal_end_token=jnp.asarray(inp["end"]))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


@requires_reference
def test_mmbt_pretraining_parity(ref_mmbt):
    """MMBTForPreTraining heads (mmbt.py:467-511): BertPreTrainingHeads
    with the LM decoder tied to the word embedding."""
    import torch
    from transformers.models.bert.modeling_bert import BertPreTrainingHeads

    model, bert_cfg = _build_ref(ref_mmbt, seed=3)
    torch.manual_seed(4)
    cls = BertPreTrainingHeads(bert_cfg).eval()
    # tie_weights (mmbt.py:455-461)
    cls.predictions.decoder.weight = \
        model.transformer.embeddings.word_embeddings.weight
    inp = _inputs()
    seq, pooled, _ = model(
        torch.tensor(inp["input_modal"]), torch.tensor(inp["input_ids"]),
        modal_start_tokens=torch.tensor(inp["start"]),
        modal_end_tokens=torch.tensor(inp["end"]),
        attention_mask=torch.tensor(inp["attention_mask"]),
        token_type_ids=torch.tensor(inp["token_type_ids"]))
    want_lm, want_rel = cls(seq, pooled)

    sd = dict(model.state_dict())
    for k, p in cls.state_dict().items():
        sd[f"cls.{k}"] = p
    params = C.mmbt_from_state_dict(sd, CFG)
    got_lm, got_rel = jmmbt.mmbt_for_pretraining(
        params, CFG,
        input_modal=jnp.asarray(inp["input_modal"]),
        input_ids=jnp.asarray(inp["input_ids"]),
        attention_mask=jnp.asarray(inp["attention_mask"]),
        token_type_ids=jnp.asarray(inp["token_type_ids"]),
        modal_start_token=jnp.asarray(inp["start"]),
        modal_end_token=jnp.asarray(inp["end"]))
    np.testing.assert_allclose(np.asarray(got_lm),
                               want_lm.detach().numpy(), atol=3e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_rel),
                               want_rel.detach().numpy(), atol=2e-4,
                               rtol=1e-3)


def test_mmbt_pretrain_losses_run():
    cfg = jmmbt.MMBTConfig(vocab_size=20, hidden_size=16,
                           num_hidden_layers=2, num_attention_heads=2,
                           modal_hidden_size=8, max_position_embeddings=24)
    params = jmmbt.init_mmbt(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(90)
    losses = jmmbt.mmbt_pretrain_losses(
        params, cfg,
        lm_label_ids=jnp.asarray(
            rs.randint(-1, cfg.vocab_size, (2, 4))),
        image_text_alignment=jnp.asarray(rs.randint(0, 2, (2,))),
        input_modal=jnp.asarray(rand(2, 3, 8, seed=91)),
        input_ids=jnp.asarray(rs.randint(0, cfg.vocab_size, (2, 4))),
        attention_mask=jnp.ones((2, 4), jnp.int32),
        token_type_ids=jnp.zeros((2, 4), jnp.int32))
    assert np.isfinite(float(losses["masked_lm_loss"]))
    assert np.isfinite(float(losses["alignment_loss"]))
