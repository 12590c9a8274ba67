"""Checkpoint key/shape manifest contract tests for the five published
checkpoint families (SURVEY §5 checkpoint-conversion fidelity).

Each manifest is either generated authoritatively IN-PROCESS from the
same code that produced the published checkpoint (the reference CLIP
model class, HF transformers' LxmertForQuestionAnswering, the reference
GeneralizedRCNN at VG scale, the reference DETR Transformer module) or
synthesised from the documented torchvision/MMF naming convention
(DETR's resnet50 backbone, the MMF visual_bert tarball).

The contract asserted for every converter:
  1. conversion succeeds on EXACTLY the published key set (no missing
     key can hide until the first real-weight run);
  2. parameter-count conservation — the converted pytree holds exactly
     as many scalars as the manifest's weights minus the explicitly
     ignorable keys (a silently dropped tensor fails the count).
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")

from transformer_mm_explainability_tpu.utils import convert


def _rand_like_manifest(manifest, seed=0):
    """{key: shape} → {key: random torch tensor}."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for k, shape in manifest.items():
        sd[k] = torch.randn(tuple(shape), generator=g) * 0.02
    return sd


def _numel(tree) -> int:
    import jax

    return int(sum(np.prod(x.shape) if hasattr(x, "shape") else 1
                   for x in jax.tree_util.tree_leaves(tree)))


def _manifest_numel(manifest, ignored=()) -> int:
    return int(sum(int(np.prod(s)) for k, s in manifest.items()
                   if k not in ignored
                   and not any(k.endswith(suf) for suf in ignored)))


# ---------------------------------------------------------------------------
# 1. CLIP ViT-B/32 (openai release .pt; schema = reference model class)
# ---------------------------------------------------------------------------

@requires_reference
def test_clip_vit_b32_manifest():
    import importlib.util
    import types

    pkg = types.ModuleType("refclip2")
    pkg.__path__ = [str(REFERENCE / "CLIP" / "clip")]
    sys.modules.setdefault("refclip2", pkg)
    mods = {}
    for name in ("auxilary", "model"):
        spec = importlib.util.spec_from_file_location(
            f"refclip2.{name}", str(REFERENCE / "CLIP/clip" / f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refclip2.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod

    # the published ViT-B/32 dims (CLIP/clip/model.py build_model infers
    # exactly these from the checkpoint)
    ref = mods["model"].CLIP(
        embed_dim=512, image_resolution=224, vision_layers=12,
        vision_width=768, vision_patch_size=32, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12)
    manifest = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    sd = _rand_like_manifest(manifest)
    sd["logit_scale"] = torch.tensor(2.6593)

    params, cfg = convert.clip_from_state_dict(sd)
    assert cfg.context_length == 77 and cfg.vocab_size == 49408
    assert cfg.vision_width == 768 and cfg.vision_patch_size == 32
    assert _numel(params) == _manifest_numel(manifest), (
        "converted CLIP params drop or duplicate scalars vs the "
        "published schema")


# ---------------------------------------------------------------------------
# 2. HF unc-nlp/lxmert-vqa-uncased (schema = transformers model class)
# ---------------------------------------------------------------------------

def test_lxmert_vqa_uncased_manifest():
    from transformers import LxmertConfig, LxmertForQuestionAnswering

    hf_cfg = LxmertConfig(num_qa_labels=3129)
    with torch.no_grad():
        model = LxmertForQuestionAnswering(hf_cfg)
    manifest = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    sd = model.state_dict()

    from transformer_mm_explainability_tpu.models import lxmert as lx

    cfg = lx.LXMERT_VQA
    params = convert.lxmert_from_state_dict(sd, cfg)
    # the QA checkpoint carries no pretraining heads; everything in the
    # base + answer head must land
    ignored = ("lxmert.embeddings.position_ids",)  # HF buffer
    # HF's LxmertXLayer applies ONE shared visual_attention module in
    # both cross directions; our pytree materialises its output
    # LayerNorm once per direction (cross_ln_lang == cross_ln_visn, see
    # utils/convert.lxmert_from_state_dict), so 5 x-layers duplicate
    # one LN (weight+bias) each
    tied_duplicates = cfg.x_layers * 2 * cfg.hidden_size
    want = _manifest_numel(manifest, ignored) + tied_duplicates
    got = _numel(params)
    assert got == want, f"param count {got} != manifest {want}"


# ---------------------------------------------------------------------------
# 3. unc-nlp/frcnn-vg-finetuned (schema = reference GeneralizedRCNN @ VG)
# ---------------------------------------------------------------------------

@requires_reference
def test_frcnn_vg_manifest():
    from test_frcnn_parity import _install_torchvision_shim

    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _install_torchvision_shim()
    import importlib

    from _shims import ensure_stub

    for name in ("wget", "cv2"):
        ensure_stub(name)
    mf = importlib.import_module("lxmert.lxmert.src.modeling_frcnn")
    vu = importlib.import_module("lxmert.lxmert.src.vqa_utils")
    from test_frcnn_parity import _ref_config_dict

    # full VG scale
    cfg_dict = _ref_config_dict()
    cfg_dict["resnets"]["depth"] = 101
    cfg_dict["roi_heads"]["num_classes"] = 1600
    cfg_dict["roi_box_head"]["num_attrs"] = 400
    cfg_dict["rpn"]["pre_nms_topk_test"] = 6000
    cfg_dict["rpn"]["post_nms_topk_test"] = 1000
    cfg_dict["max_detections"] = 36
    with torch.no_grad():
        model = mf.GeneralizedRCNN(vu.Config(cfg_dict))
    manifest = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    sd = model.state_dict()

    from transformer_mm_explainability_tpu.models import frcnn as jfrcnn

    params = convert.frcnn_from_state_dict(sd, jfrcnn.FRCNN_VG)
    ignored = (
        # anchor geometry constants + BN step counters, not weights
        "proposal_generator.anchor_generator.cell_anchors.0",
        "num_batches_tracked",
    )
    want = _manifest_numel(manifest, ignored)
    got = _numel(params)
    assert got == want, f"param count {got} != manifest {want}"


# ---------------------------------------------------------------------------
# 4. facebook detr-r50-e632da11.pth (transformer schema = reference
#    module; backbone = torchvision resnet50 naming convention)
# ---------------------------------------------------------------------------

def _resnet50_backbone_manifest(prefix="backbone.0.body."):
    m = {f"{prefix}conv1.weight": (64, 3, 7, 7)}
    for s in ("weight", "bias", "running_mean", "running_var"):
        m[f"{prefix}bn1.{s}"] = (64,)
    m[f"{prefix}bn1.num_batches_tracked"] = ()
    stages = (3, 4, 6, 3)
    in_ch = 64
    for si, n in enumerate(stages):
        mid = 64 * 2 ** si
        out = mid * 4
        for bi in range(n):
            p = f"{prefix}layer{si + 1}.{bi}"
            m[f"{p}.conv1.weight"] = (mid, in_ch, 1, 1)
            m[f"{p}.conv2.weight"] = (mid, mid, 3, 3)
            m[f"{p}.conv3.weight"] = (out, mid, 1, 1)
            for ci, ch in (("1", mid), ("2", mid), ("3", out)):
                for s in ("weight", "bias", "running_mean", "running_var"):
                    m[f"{p}.bn{ci}.{s}"] = (ch,)
                m[f"{p}.bn{ci}.num_batches_tracked"] = ()
            if bi == 0:
                m[f"{p}.downsample.0.weight"] = (out, in_ch, 1, 1)
                for s in ("weight", "bias", "running_mean", "running_var"):
                    m[f"{p}.downsample.1.{s}"] = (out,)
                m[f"{p}.downsample.1.num_batches_tracked"] = ()
            in_ch = out
    return m


def _detr_transformer_manifest(D=256, F=2048, enc=6, dec=6):
    """The RELEASED checkpoint was trained with torch's fused-in_proj
    nn.MultiheadAttention (the reference's instrumented copy splits
    q/k/v only at load, DETR/modules/layers.py:711-726), so the
    published schema is synthesised from that convention."""
    m = {}

    def mha(p):
        m[f"{p}.in_proj_weight"] = (3 * D, D)
        m[f"{p}.in_proj_bias"] = (3 * D,)
        m[f"{p}.out_proj.weight"] = (D, D)
        m[f"{p}.out_proj.bias"] = (D,)

    def lnorm(p):
        m[f"{p}.weight"] = (D,)
        m[f"{p}.bias"] = (D,)

    for i in range(enc):
        p = f"transformer.encoder.layers.{i}"
        mha(f"{p}.self_attn")
        m[f"{p}.linear1.weight"] = (F, D)
        m[f"{p}.linear1.bias"] = (F,)
        m[f"{p}.linear2.weight"] = (D, F)
        m[f"{p}.linear2.bias"] = (D,)
        lnorm(f"{p}.norm1")
        lnorm(f"{p}.norm2")
    for i in range(dec):
        p = f"transformer.decoder.layers.{i}"
        mha(f"{p}.self_attn")
        mha(f"{p}.multihead_attn")
        m[f"{p}.linear1.weight"] = (F, D)
        m[f"{p}.linear1.bias"] = (F,)
        m[f"{p}.linear2.weight"] = (D, F)
        m[f"{p}.linear2.bias"] = (D,)
        lnorm(f"{p}.norm1")
        lnorm(f"{p}.norm2")
        lnorm(f"{p}.norm3")
    lnorm("transformer.decoder.norm")
    return m


def test_detr_r50_manifest():
    manifest = _detr_transformer_manifest()
    manifest.update(_resnet50_backbone_manifest())
    manifest.update({
        "class_embed.weight": (92, 256), "class_embed.bias": (92,),
        "query_embed.weight": (100, 256),
        "input_proj.weight": (256, 2048, 1, 1), "input_proj.bias": (256,),
    })
    for i, (din, dout) in enumerate(((256, 256), (256, 256), (256, 4))):
        manifest[f"bbox_embed.layers.{i}.weight"] = (dout, din)
        manifest[f"bbox_embed.layers.{i}.bias"] = (dout,)
    sd = _rand_like_manifest(manifest)

    from transformer_mm_explainability_tpu.models import detr as jdetr

    params = convert.detr_from_state_dict(sd, jdetr.DETR_R50)
    ignored = {"num_batches_tracked"}
    want = _manifest_numel(manifest, ignored)
    got = _numel(params)
    assert got == want, f"param count {got} != manifest {want}"


# ---------------------------------------------------------------------------
# 5. MMF visual_bert.finetuned.vqa2 tarball (BertModel naming + the
#    visio-linguistic extras + the MMF classification head,
#    VisualBERT/mmf/models/visual_bert.py:296-330 /
#    mmf/modules/embeddings.py:300-320; checkpoint keys carry the
#    ``model.`` prefix per mmf/utils/checkpoint.py)
# ---------------------------------------------------------------------------

def _mmf_visual_bert_manifest(L=12, D=768, I=3072, vocab=30522,
                              visual_dim=2048, num_labels=3129):
    m = {
        "model.bert.embeddings.word_embeddings.weight": (vocab, D),
        "model.bert.embeddings.position_embeddings.weight": (512, D),
        "model.bert.embeddings.token_type_embeddings.weight": (2, D),
        "model.bert.embeddings.LayerNorm.weight": (D,),
        "model.bert.embeddings.LayerNorm.bias": (D,),
        "model.bert.embeddings.projection.weight": (D, visual_dim),
        "model.bert.embeddings.projection.bias": (D,),
        "model.bert.embeddings.token_type_embeddings_visual.weight": (2, D),
        "model.bert.embeddings.position_embeddings_visual.weight": (512, D),
        "model.bert.pooler.dense.weight": (D, D),
        "model.bert.pooler.dense.bias": (D,),
        "model.classifier.0.dense.weight": (D, D),
        "model.classifier.0.dense.bias": (D,),
        "model.classifier.0.LayerNorm.weight": (D,),
        "model.classifier.0.LayerNorm.bias": (D,),
        "model.classifier.1.weight": (num_labels, D),
        "model.classifier.1.bias": (num_labels,),
    }
    for i in range(L):
        p = f"model.bert.encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            m[f"{p}.attention.self.{qkv}.weight"] = (D, D)
            m[f"{p}.attention.self.{qkv}.bias"] = (D,)
        m[f"{p}.attention.output.dense.weight"] = (D, D)
        m[f"{p}.attention.output.dense.bias"] = (D,)
        m[f"{p}.attention.output.LayerNorm.weight"] = (D,)
        m[f"{p}.attention.output.LayerNorm.bias"] = (D,)
        m[f"{p}.intermediate.dense.weight"] = (I, D)
        m[f"{p}.intermediate.dense.bias"] = (I,)
        m[f"{p}.output.dense.weight"] = (D, I)
        m[f"{p}.output.dense.bias"] = (D,)
        m[f"{p}.output.LayerNorm.weight"] = (D,)
        m[f"{p}.output.LayerNorm.bias"] = (D,)
    return m


def test_mmf_visual_bert_manifest():
    from transformer_mm_explainability_tpu.models import visual_bert as vb
    from transformer_mm_explainability_tpu.utils import mmf_loader

    manifest = _mmf_visual_bert_manifest()
    sd = _rand_like_manifest(manifest)
    params = mmf_loader.visual_bert_from_state_dict(
        sd, vb.VISUAL_BERT_VQA2)
    want = _manifest_numel(manifest)
    got = _numel(params)
    assert got == want, f"param count {got} != manifest {want}"
