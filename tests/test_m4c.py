"""M4C parity (C34): TextBert / MMT / OcrPtrNet / PrevPredEmbeddings
and the full teacher-forced + greedy-decode forwards vs the in-process
reference (VisualBERT/mmf/models/m4c.py) with shared random weights.

The M4C wrapper class needs omegaconf + MMF's config cascade; the test
composes the reference's real module classes exactly as
M4C.forward/_forward_* do (m4c.py:173-302), with the config-dependent
plumbing (fc7 encoders, projections, layer norms) built from the same
plain torch modules the encoders reduce to.
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

from transformer_mm_explainability_tpu.models import m4c as jm4c  # noqa: E402
from transformer_mm_explainability_tpu.utils import convert_mmf as C  # noqa: E402


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_m4c():
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

    class _BaseModel(torch.nn.Module):
        def __init__(self, config=None):
            super().__init__()
            self.config = config

    add("VisualBERT.mmf.models.base_model",
        _stub_module("VisualBERT.mmf.models.base_model",
                     BaseModel=_BaseModel))
    add("VisualBERT.mmf.utils.build",
        _stub_module("VisualBERT.mmf.utils.build",
                     build_image_encoder=lambda *a, **k: None))
    add("VisualBERT.mmf.modules.layers",
        _stub_module("VisualBERT.mmf.modules.layers",
                     ClassifierLayer=object))
    add("omegaconf", _stub_module("omegaconf", OmegaConf=object))
    add("transformers.modeling_bert", modeling_bert)

    spec = importlib.util.spec_from_file_location(
        "ref_m4c_mod",
        str(REFERENCE / "VisualBERT/mmf/models/m4c.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_m4c_mod"] = mod
    added.append("ref_m4c_mod")

    # registry: the reference module registers itself at import
    reg_spec = importlib.util.spec_from_file_location(
        "VisualBERT.mmf.common.registry",
        str(REFERENCE / "VisualBERT/mmf/common/registry.py"))
    reg = importlib.util.module_from_spec(reg_spec)
    add("VisualBERT.mmf.common.registry", reg)
    reg_spec.loader.exec_module(reg)

    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in added:
            sys.modules.pop(name, None)


CFG = jm4c.M4CConfig(vocab_size=30, num_fixed_answers=8, hidden_size=32,
                     num_heads=4, text_bert_layers=2, mmt_layers=2,
                     obj_in_dim=16, ocr_fc7_dim=16,
                     ocr_in_dim=12 + 20 + 16 + 6)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class _RefHarness:
    """The reference M4C graph (m4c.py:42-172 build) on tiny dims."""

    def __init__(self, m4c_mod, cfg):
        import torch
        from transformers import BertConfig

        torch.manual_seed(0)
        self.m = m4c_mod
        self.cfg = cfg
        bert_kw = dict(vocab_size=cfg.vocab_size,
                       hidden_size=cfg.hidden_size,
                       num_attention_heads=cfg.num_heads,
                       intermediate_size=4 * cfg.hidden_size,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
        self.text_bert = m4c_mod.TextBert(
            BertConfig(num_hidden_layers=cfg.text_bert_layers,
                       **bert_kw)).eval()
        self.mmt = m4c_mod.MMT(
            BertConfig(num_hidden_layers=cfg.mmt_layers, **bert_kw)).eval()
        self.obj_fc7_lc = torch.nn.Linear(cfg.ocr_fc7_dim, cfg.ocr_fc7_dim)
        self.ocr_fc7_lc = torch.nn.Linear(cfg.ocr_fc7_dim, cfg.ocr_fc7_dim)
        self.lin_obj_feat = torch.nn.Linear(cfg.obj_in_dim, cfg.hidden_size)
        self.lin_obj_bbox = torch.nn.Linear(4, cfg.hidden_size)
        self.obj_feat_ln = torch.nn.LayerNorm(cfg.hidden_size)
        self.obj_bbox_ln = torch.nn.LayerNorm(cfg.hidden_size)
        self.lin_ocr_feat = torch.nn.Linear(cfg.ocr_in_dim, cfg.hidden_size)
        self.lin_ocr_bbox = torch.nn.Linear(4, cfg.hidden_size)
        self.ocr_feat_ln = torch.nn.LayerNorm(cfg.hidden_size)
        self.ocr_bbox_ln = torch.nn.LayerNorm(cfg.hidden_size)
        self.classifier = torch.nn.Linear(cfg.hidden_size,
                                          cfg.num_fixed_answers)
        self.ocr_ptr_net = m4c_mod.OcrPtrNet(
            hidden_size=cfg.hidden_size).eval()

    def state_dict(self):
        sd = {}
        pairs = (("text_bert", self.text_bert), ("mmt", self.mmt),
                 ("obj_faster_rcnn_fc7.lc", self.obj_fc7_lc),
                 ("ocr_faster_rcnn_fc7.lc", self.ocr_fc7_lc),
                 ("linear_obj_feat_to_mmt_in", self.lin_obj_feat),
                 ("linear_obj_bbox_to_mmt_in", self.lin_obj_bbox),
                 ("obj_feat_layer_norm", self.obj_feat_ln),
                 ("obj_bbox_layer_norm", self.obj_bbox_ln),
                 ("linear_ocr_feat_to_mmt_in", self.lin_ocr_feat),
                 ("linear_ocr_bbox_to_mmt_in", self.lin_ocr_bbox),
                 ("ocr_feat_layer_norm", self.ocr_feat_ln),
                 ("ocr_bbox_layer_norm", self.ocr_bbox_ln),
                 ("classifier.module", self.classifier),
                 ("ocr_ptr_net", self.ocr_ptr_net))
        for name, mod in pairs:
            for k, p in mod.state_dict().items():
                sd[f"{name}.{k}"] = p
        return sd

    def encodings(self, batch):
        """_forward_{txt,obj,ocr}_encoding (m4c.py:187-255)."""
        import torch
        import torch.nn.functional as F
        t = {k: torch.tensor(v) for k, v in batch.items()}
        txt_mask = self.m._get_mask(t["txt_len"], t["txt_inds"].size(1))
        obj_fc7 = F.normalize(F.relu(self.obj_fc7_lc(t["obj_fc6"])), dim=-1)
        obj_in = self.obj_feat_ln(self.lin_obj_feat(obj_fc7)) + \
            self.obj_bbox_ln(self.lin_obj_bbox(t["obj_bbox"]))
        obj_mask = self.m._get_mask(t["obj_nums"], obj_in.size(1))
        ocr_ft = F.normalize(t["ocr_fasttext"], dim=-1)
        ocr_ph = F.normalize(t["ocr_phoc"], dim=-1)
        ocr_fc7 = F.normalize(F.relu(self.ocr_fc7_lc(t["ocr_fc6"])), dim=-1)
        ocr_feat = torch.cat(
            [ocr_ft, ocr_ph, ocr_fc7, torch.zeros_like(t["ocr_order"])],
            dim=-1)
        ocr_in = self.ocr_feat_ln(self.lin_ocr_feat(ocr_feat)) + \
            self.ocr_bbox_ln(self.lin_ocr_bbox(t["ocr_bbox"]))
        ocr_mask = self.m._get_mask(t["ocr_nums"], ocr_in.size(1))
        txt_emb = self.text_bert(txt_inds=t["txt_inds"], txt_mask=txt_mask)
        return dict(txt_emb=txt_emb, txt_mask=txt_mask, obj_emb=obj_in,
                    obj_mask=obj_mask, ocr_emb=ocr_in, ocr_mask=ocr_mask)

    def scores(self, enc, prev_inds):
        """_forward_mmt + _forward_output (m4c.py:259-286)."""
        import torch
        res = self.mmt(txt_emb=enc["txt_emb"], txt_mask=enc["txt_mask"],
                       obj_emb=enc["obj_emb"], obj_mask=enc["obj_mask"],
                       ocr_emb=enc["ocr_emb"], ocr_mask=enc["ocr_mask"],
                       fixed_ans_emb=self.classifier.weight,
                       prev_inds=prev_inds)
        fixed = self.classifier(res["mmt_dec_output"])
        dyn = self.ocr_ptr_net(res["mmt_dec_output"],
                               res["mmt_ocr_output"], enc["ocr_mask"])
        return torch.cat([fixed, dyn], dim=-1)


def _batch(cfg, B=2, T=6, NOBJ=5, NOCR=4, TDEC=3):
    rs = np.random.RandomState(60)
    return {
        "txt_inds": rs.randint(0, cfg.vocab_size, (B, T)),
        "txt_len": np.array([6, 3], np.int64),
        "obj_fc6": rand(B, NOBJ, cfg.ocr_fc7_dim, seed=61),
        "obj_bbox": rand(B, NOBJ, 4, seed=62),
        "obj_nums": np.array([5, 2], np.int64),
        "ocr_fasttext": rand(B, NOCR, 12, seed=63),
        "ocr_phoc": rand(B, NOCR, 20, seed=64),
        "ocr_fc6": rand(B, NOCR, cfg.ocr_fc7_dim, seed=65),
        "ocr_order": rand(B, NOCR, 6, seed=66),
        "ocr_bbox": rand(B, NOCR, 4, seed=67),
        "ocr_nums": np.array([4, 3], np.int64),
    }, TDEC


@requires_reference
def test_m4c_teacher_forced_parity(ref_m4c):
    import torch
    h = _RefHarness(ref_m4c, CFG)
    batch, TDEC = _batch(CFG)
    prev_inds = np.random.RandomState(68).randint(
        0, CFG.num_fixed_answers + 4, (2, TDEC))
    enc = h.encodings(batch)
    want = h.scores(enc, torch.tensor(prev_inds)).detach().numpy()

    params = C.m4c_from_state_dict(h.state_dict(), CFG)
    got = jm4c.m4c_forward(
        params, CFG,
        jnp.asarray(batch["txt_inds"]), jnp.asarray(batch["txt_len"]),
        jnp.asarray(batch["obj_fc6"]), jnp.asarray(batch["obj_bbox"]),
        jnp.asarray(batch["obj_nums"]),
        jnp.asarray(batch["ocr_fasttext"]), jnp.asarray(batch["ocr_phoc"]),
        jnp.asarray(batch["ocr_fc6"]), jnp.asarray(batch["ocr_order"]),
        jnp.asarray(batch["ocr_bbox"]), jnp.asarray(batch["ocr_nums"]),
        prev_inds=jnp.asarray(prev_inds))
    assert got.shape == (2, TDEC, CFG.num_fixed_answers + 4)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@requires_reference
def test_m4c_greedy_decode_parity(ref_m4c):
    """m4c.py:288-302 greedy loop == our lax.scan."""
    import torch
    h = _RefHarness(ref_m4c, CFG)
    batch, TDEC = _batch(CFG)
    enc = h.encodings(batch)
    prev = torch.zeros(2, TDEC, dtype=torch.long)
    prev[:, 0] = CFG.bos_idx
    for _ in range(TDEC):
        scores = h.scores(enc, prev)
        argmax = scores.argmax(dim=-1)
        prev[:, 1:] = argmax[:, :-1]
    want = scores.detach().numpy()

    params = C.m4c_from_state_dict(h.state_dict(), CFG)
    got = jm4c.m4c_forward(
        params, CFG,
        jnp.asarray(batch["txt_inds"]), jnp.asarray(batch["txt_len"]),
        jnp.asarray(batch["obj_fc6"]), jnp.asarray(batch["obj_bbox"]),
        jnp.asarray(batch["obj_nums"]),
        jnp.asarray(batch["ocr_fasttext"]), jnp.asarray(batch["ocr_phoc"]),
        jnp.asarray(batch["ocr_fc6"]), jnp.asarray(batch["ocr_order"]),
        jnp.asarray(batch["ocr_bbox"]), jnp.asarray(batch["ocr_nums"]),
        dec_steps=TDEC)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@requires_reference
def test_prev_pred_embeddings_parity(ref_m4c):
    import torch
    from transformers import BertConfig
    torch.manual_seed(1)
    m = ref_m4c.PrevPredEmbeddings(
        BertConfig(hidden_size=16, hidden_dropout_prob=0.0)).eval()
    ans = rand(6, 16, seed=70)
    ocr = rand(2, 4, 16, seed=71)
    inds = np.random.RandomState(72).randint(0, 10, (2, 3))
    want = m(torch.tensor(ans), torch.tensor(ocr),
             torch.tensor(inds)).detach().numpy()
    pp = {"position": jnp.asarray(
              m.position_embeddings.weight.detach().numpy()),
          "token_type": jnp.asarray(
              m.token_type_embeddings.weight.detach().numpy()),
          "ans_ln": {"scale": jnp.asarray(
                         m.ans_layer_norm.weight.detach().numpy()),
                     "bias": jnp.asarray(
                         m.ans_layer_norm.bias.detach().numpy())},
          "ocr_ln": {"scale": jnp.asarray(
                         m.ocr_layer_norm.weight.detach().numpy()),
                     "bias": jnp.asarray(
                         m.ocr_layer_norm.bias.detach().numpy())},
          "emb_ln": {"scale": jnp.asarray(
                         m.emb_layer_norm.weight.detach().numpy()),
                     "bias": jnp.asarray(
                         m.emb_layer_norm.bias.detach().numpy())}}
    cfg = jm4c.M4CConfig(hidden_size=16)
    got = jm4c.prev_pred_embeddings_fwd(
        {"mmt": {"prev_pred": pp}}, cfg, jnp.asarray(ans),
        jnp.asarray(ocr), jnp.asarray(inds))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


@requires_reference
def test_ocr_ptr_net_parity(ref_m4c):
    import torch
    torch.manual_seed(2)
    m = ref_m4c.OcrPtrNet(hidden_size=16).eval()
    q = rand(2, 3, 16, seed=73)
    k = rand(2, 4, 16, seed=74)
    mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32)
    want = m(torch.tensor(q), torch.tensor(k),
             torch.tensor(mask)).detach().numpy()
    p = {"ocr_ptr_net": {
        "query": {"w": jnp.asarray(m.query.weight.detach().numpy()),
                  "b": jnp.asarray(m.query.bias.detach().numpy())},
        "key": {"w": jnp.asarray(m.key.weight.detach().numpy()),
                "b": jnp.asarray(m.key.bias.detach().numpy())}}}
    cfg = jm4c.M4CConfig(hidden_size=16)
    got = jm4c.ocr_ptr_net_fwd(p, cfg, jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)
