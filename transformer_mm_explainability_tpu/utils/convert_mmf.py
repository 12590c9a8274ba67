"""Torch→JAX weight converters for the MMF model zoo (C34).

Maps the reference module state dicts (``VisualBERT/mmf/modules/
{layers,attention,embeddings}.py`` and ``mmf/models/{pythia,lorra,ban,
butd,cnn_lstm}.py``) onto the params pytrees of
``models/mmf_layers.py`` / ``models/mmf_zoo.py``.

weight_norm layers keep torch's (v, g) parameterisation verbatim:
``weight_g`` is a 0-dim tensor for ``dim=None`` wraps and ``[out, 1]``
for the default ``dim=0`` wraps — both collapse onto our scalar /
``[out]`` layouts.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _wn(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    """weight_norm linear: dim=None → scalar g; dim=0 → g [out]."""
    g = _np(sd[f"{prefix}.weight_g"])
    g = jnp.asarray(g.reshape(()) if g.size == 1 else g.reshape(-1))
    out = {"v": jnp.asarray(_np(sd[f"{prefix}.weight_v"])), "g": g}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _relu_wn_fc(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """ReLUWithWeightNormFC: the linear sits at ``.layers.0``."""
    p = prefix + "." if prefix else ""
    return _wn(sd, f"{p}layers.0")


def _rnn(sd: Mapping[str, Any], prefix: str, layer: int = 0,
         reverse: bool = False) -> Dict[str, jnp.ndarray]:
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {k: jnp.asarray(_np(sd[f"{prefix}.{name}{sfx}"]))
            for k, name in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                            ("b_ih", "bias_ih"), ("b_hh", "bias_hh"))}


def _rnn_cell(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(_np(sd[f"{prefix}.{name}"]))
            for k, name in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                            ("b_ih", "bias_ih"), ("b_hh", "bias_hh"))}


def _birnn(sd: Mapping[str, Any], prefix: str,
           bidirectional: bool) -> Dict[str, Any]:
    p = {"fwd": _rnn(sd, prefix)}
    if bidirectional:
        p["bwd"] = _rnn(sd, prefix, reverse=True)
    return p


def _conv1d_k1(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    """k=1 Conv1d [out, in, 1] → matmul weight [out, in]."""
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"])[:, :, 0]),
            "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def attention_text_embedding_from_sd(sd: Mapping[str, Any],
                                     prefix: str = "",
                                     bidirectional: bool = False
                                     ) -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {
        "lstm": _birnn(sd, f"{p}recurrent_unit", bidirectional),
        "conv1": _conv1d_k1(sd, f"{p}conv1"),
        "conv2": _conv1d_k1(sd, f"{p}conv2"),
    }


def nlem_from_sd(sd: Mapping[str, Any], prefix: str = "",
                 has_context: bool = False) -> Dict[str, Any]:
    """NonLinearElementMultiply."""
    p = prefix + "." if prefix else ""
    out = {"fa_image": _relu_wn_fc(sd, f"{p}fa_image"),
           "fa_txt": _relu_wn_fc(sd, f"{p}fa_txt")}
    if has_context:
        out["fa_context"] = _relu_wn_fc(sd, f"{p}fa_context")
    return out


def logit_classifier_from_sd(sd: Mapping[str, Any],
                             prefix: str = "") -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {
        "f_o_text": _relu_wn_fc(sd, f"{p}f_o_text"),
        "f_o_image": _relu_wn_fc(sd, f"{p}f_o_image"),
        "linear_text": _lin(sd, f"{p}linear_text"),
        "linear_image": _lin(sd, f"{p}linear_image"),
    }


def fc_net_from_sd(sd: Mapping[str, Any], prefix: str,
                   act: str | None) -> Dict[str, Any]:
    """FCNet: weight-norm linears at whatever Sequential indices the
    act/dropout layout produced — recovered by scanning the keys."""
    base = (prefix + "." if prefix else "") + "main."
    idxs = sorted({int(k[len(base):].split(".")[0])
                   for k in sd if k.startswith(base)
                   and k.endswith("weight_v")})
    return {"layers": [_wn(sd, f"{base}{i}") for i in idxs]}


def bc_net_from_sd(sd: Mapping[str, Any], prefix: str, k: int,
                   h_out: int | None, act: str = "ReLU") -> Dict[str, Any]:
    p0 = prefix + "." if prefix else ""
    p: Dict[str, Any] = {
        "v_net": fc_net_from_sd(sd, f"{p0}v_net", act),
        "q_net": fc_net_from_sd(sd, f"{p0}q_net", act),
    }
    if f"{p0}h_mat" in sd:
        p["h_mat"] = jnp.asarray(_np(sd[f"{p0}h_mat"]))
        p["h_bias"] = jnp.asarray(_np(sd[f"{p0}h_bias"]))
    if f"{p0}h_net.weight_v" in sd:
        p["h_net"] = _wn(sd, f"{p0}h_net")
    return p


def bi_attention_from_sd(sd: Mapping[str, Any], prefix: str,
                         glimpse: int) -> Dict[str, Any]:
    """BiAttention: BCNet + externally weight-normed h_mat
    (``h_mat_g`` 0-dim, ``h_mat_v`` the raw tensor)."""
    base = (prefix + "." if prefix else "") + "logits"
    bc = bc_net_from_sd(sd, base, k=3, h_out=glimpse)
    bc.pop("h_mat", None)
    bc["h_mat_v"] = jnp.asarray(_np(sd[f"{base}.h_mat_v"]))
    bc["h_mat_g"] = jnp.asarray(
        _np(sd[f"{base}.h_mat_g"]).reshape(()))
    bc["h_bias"] = jnp.asarray(_np(sd[f"{base}.h_bias"]))
    return {"logits": bc}


def weight_norm_classifier_from_sd(sd: Mapping[str, Any],
                                   prefix: str = "") -> Dict[str, Any]:
    """WeightNormClassifier Sequential: [wn, ReLU, Dropout, wn]."""
    p = prefix + "." if prefix else ""
    return {"fc1": _wn(sd, f"{p}main.0"), "fc2": _wn(sd, f"{p}main.3")}


def mlp_classifier_from_sd(sd: Mapping[str, Any], prefix: str = "",
                           num_layers: int = 0) -> Dict[str, Any]:
    """MLPClassifer ModuleList layout: [Linear, BN, act, Dropout]* +
    final Linear."""
    p = prefix + "." if prefix else ""
    hidden = []
    for i in range(num_layers):
        base = 4 * i
        hidden.append({
            "lin": _lin(sd, f"{p}layers.{base}"),
            "bn": _bn(sd, f"{p}layers.{base + 1}"),
        })
    return {"hidden": hidden,
            "out": _lin(sd, f"{p}layers.{4 * num_layers}")}


def _bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
            "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
            "var": jnp.asarray(_np(sd[f"{prefix}.running_var"]))}


def conv_net_from_sd(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {"w": jnp.asarray(_np(sd[f"{p}conv.weight"])),
            "b": jnp.asarray(_np(sd[f"{p}conv.bias"])),
            "bn": _bn(sd, f"{p}batch_norm_2d")}


def top_down_attention_lstm_from_sd(sd: Mapping[str, Any],
                                    prefix: str = "") -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {"fa_image": _wn(sd, f"{p}fa_image"),
            "fa_hidden": _wn(sd, f"{p}fa_hidden"),
            "td_lstm": _rnn_cell(sd, f"{p}top_down_lstm")}


def language_decoder_from_sd(sd: Mapping[str, Any],
                             prefix: str = "") -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {"fc": _wn(sd, f"{p}fc"),
            "lm_lstm": _rnn_cell(sd, f"{p}language_lstm")}


def gated_tanh_from_sd(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"fc": _lin(sd, f"{prefix}.fc"),
            "gate": _lin(sd, f"{prefix}.gate_fc")}


def project_attention_from_sd(sd: Mapping[str, Any],
                              prefix: str = "") -> Dict[str, Any]:
    p = prefix + "." if prefix else ""
    return {"fa_image": gated_tanh_from_sd(sd, f"{p}fa_image"),
            "fa_txt": gated_tanh_from_sd(sd, f"{p}fa_txt"),
            "lc": _lin(sd, f"{p}lc")}


# ---------------------------------------------------------------------------
# full-model converters (reference top-level state-dict layouts)
# ---------------------------------------------------------------------------

def pythia_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Pythia layout (pythia.py build():39-46) with format_state_key
    (pythia.py:31-37) applied: ``image_feature_encoders.0.module.lc`` ≡
    ``image_feature_encoders.0.lc``."""
    sd = {k.replace("fa_history", "fa_context")
           .replace("image_feature_encoders.0.module.lc",
                    "image_feature_encoders.0.lc"): v
          for k, v in sd.items()}
    encs = []
    for i, kind in enumerate(cfg.image_encoders):
        if kind == "finetune":
            encs.append({"lc": _lin(sd, f"image_feature_encoders.{i}.lc")})
        else:
            encs.append({})
    streams = []
    for i in range(len(cfg.image_encoders)):
        base = f"image_feature_embeddings_list.{i}.0.image_attention_model.module"
        streams.append({
            "combine": nlem_from_sd(sd, f"{base}.combination_layer.module"),
            "transform": _wn(sd, f"{base}.transform.module.lc"),
        })
    return {
        "word_embedding": jnp.asarray(_np(sd["word_embedding.weight"])),
        "text_embedding": attention_text_embedding_from_sd(
            sd, "text_embeddings.0"),
        "image_encoders": encs,
        "image_streams": streams,
        "combine": nlem_from_sd(
            sd, "image_text_multi_modal_combine_layer.module",
            has_context=any(
                k.startswith("image_text_multi_modal_combine_layer."
                             "module.fa_context") for k in sd)),
        "classifier": logit_classifier_from_sd(sd, "classifier.module"),
    }


def _torch_mha_qkv(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention with kdim != embed_dim: separate
    q/k/v projection weights + one fused in_proj_bias [3D]."""
    bias = _np(sd[f"{prefix}.in_proj_bias"])
    D = bias.shape[0] // 3
    return {
        "q": {"w": jnp.asarray(_np(sd[f"{prefix}.q_proj_weight"])),
              "b": jnp.asarray(bias[:D])},
        "k": {"w": jnp.asarray(_np(sd[f"{prefix}.k_proj_weight"])),
              "b": jnp.asarray(bias[D:2 * D])},
        "v": {"w": jnp.asarray(_np(sd[f"{prefix}.v_proj_weight"])),
              "b": jnp.asarray(bias[2 * D:])},
        "out": _lin(sd, f"{prefix}.out_proj"),
    }


def pythia_multihead_from_state_dict(sd: Mapping[str, Any],
                                     cfg) -> Dict[str, Any]:
    """PythiaMultiHead layout (pythia.py:375-433): encoders +
    ProjectionEmbedding projectors (``.module.layers``) + per-stream
    MultiHeadImageFeatureEmbedding lists (``.module`` = torch MHA)."""
    encs, projs, embs = [], [], []
    for i, kind in enumerate(cfg.image_encoders):
        if kind == "finetune":
            encs.append({"lc": _lin(sd, f"image_feature_encoders.{i}.lc")})
        else:
            encs.append({})
        projs.append({"lc": _lin(
            sd, f"image_feature_projectors.{i}.module.layers")})
        embs.append([
            _torch_mha_qkv(
                sd, f"image_feature_embeddings_list.{i}.{j}.module")
            for j in range(cfg.embeddings_per_stream)])
    return {
        "word_embedding": jnp.asarray(_np(sd["word_embedding.weight"])),
        "text_embedding": attention_text_embedding_from_sd(
            sd, "text_embeddings.0"),
        "image_encoders": encs,
        "image_projectors": projs,
        "image_embeddings": embs,
        "combine": nlem_from_sd(
            sd, "image_text_multi_modal_combine_layer.module"),
        "classifier": logit_classifier_from_sd(sd, "classifier.module"),
    }


def ban_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    return {
        "word_embedding": jnp.asarray(_np(sd["word_embedding.weight"])),
        "q_emb": {"rnn": _birnn(sd, "q_emb.recurrent_encoder",
                                cfg.bidirectional)},
        "v_att": bi_attention_from_sd(sd, "v_att", cfg.gamma),
        "b_net": [bc_net_from_sd(sd, f"b_net.{g}", k=cfg.bc_k, h_out=None)
                  for g in range(cfg.gamma)],
        "q_prj": [fc_net_from_sd(sd, f"q_prj.{g}", act=None)
                  for g in range(cfg.gamma)],
        "classifier": weight_norm_classifier_from_sd(sd, "classifier"),
    }


def butd_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    sd = {k.replace("image_feature_encoders.0.module.lc",
                    "image_feature_encoders.0.lc"): v
          for k, v in sd.items()}
    base = "image_feature_embeddings_list.0.0.image_attention_model.module"
    return {
        "word_embedding": jnp.asarray(_np(sd["word_embedding.weight"])),
        "encoder": {"lc": _lin(sd, "image_feature_encoders.0.lc")},
        "td_attn": top_down_attention_lstm_from_sd(
            sd, f"{base}.combination_layer.module"),
        "transform": _wn(sd, f"{base}.transform.module.lc"),
        "decoder": language_decoder_from_sd(sd, "classifier.module"),
    }


def m4c_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """M4C layout (m4c.py build():42-172) with format_state_key
    (m4c.py:36-39) applied.  Assumes text_bert_out_linear is Identity
    (the default config: mmt.hidden_size == 768 == text bert width)."""
    from transformer_mm_explainability_tpu.utils.convert import (
        bert_embeddings_from_state_dict, bert_encoder_from_state_dict)

    sd = {k.replace("obj_faster_rcnn_fc7.module.lc", "obj_faster_rcnn_fc7.lc")
           .replace("ocr_faster_rcnn_fc7.module.lc", "ocr_faster_rcnn_fc7.lc"): v
          for k, v in sd.items()}

    def modality(name):
        return {
            "fc7": _lin(sd, f"{name}_faster_rcnn_fc7.lc"),
            "feat": _lin(sd, f"linear_{name}_feat_to_mmt_in"),
            "bbox": _lin(sd, f"linear_{name}_bbox_to_mmt_in"),
            "feat_ln": _ln(sd, f"{name}_feat_layer_norm"),
            "bbox_ln": _ln(sd, f"{name}_bbox_layer_norm"),
        }

    pp = "mmt.prev_pred_embeddings"
    return {
        "text_bert": {
            "embeddings": bert_embeddings_from_state_dict(
                sd, "text_bert.embeddings"),
            "encoder": bert_encoder_from_state_dict(
                sd, cfg.text_bert_layers, "text_bert.encoder.layer"),
        },
        "obj": modality("obj"),
        "ocr": modality("ocr"),
        "mmt": {
            "encoder": bert_encoder_from_state_dict(
                sd, cfg.mmt_layers, "mmt.encoder.layer"),
            "prev_pred": {
                "position": jnp.asarray(
                    _np(sd[f"{pp}.position_embeddings.weight"])),
                "token_type": jnp.asarray(
                    _np(sd[f"{pp}.token_type_embeddings.weight"])),
                "ans_ln": _ln(sd, f"{pp}.ans_layer_norm"),
                "ocr_ln": _ln(sd, f"{pp}.ocr_layer_norm"),
                "emb_ln": _ln(sd, f"{pp}.emb_layer_norm"),
            },
        },
        "classifier": _lin(sd, "classifier.module"),
        "ocr_ptr_net": {"query": _lin(sd, "ocr_ptr_net.query"),
                        "key": _lin(sd, "ocr_ptr_net.key")},
    }


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def mmbt_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """MMBT layout (mmbt.py): ``transformer.*`` BertModel +
    ``modal_encoder.proj_embeddings`` + classification head
    (BertPredictionHeadTransform, Linear) and/or the pretraining
    ``cls.*`` heads.  Accepts the MMF full-model prefix forms
    (``model.bert.mmbt.*`` after format_state_key, mmbt.py:598-605)."""
    from transformer_mm_explainability_tpu.utils.convert import (
        bert_embeddings_from_state_dict, bert_encoder_from_state_dict)

    sd = {k.replace("base.bert", "model.bert"): v for k, v in sd.items()}
    sd = {k.removeprefix("model.bert.").removeprefix("bert.")
           .removeprefix("mmbt."): v for k, v in sd.items()}

    def transform(prefix):
        return {"w": jnp.asarray(_np(sd[f"{prefix}.dense.weight"])),
                "b": jnp.asarray(_np(sd[f"{prefix}.dense.bias"])),
                "ln": _ln(sd, f"{prefix}.LayerNorm")}

    params: Dict[str, Any] = {
        "embeddings": bert_embeddings_from_state_dict(
            sd, "transformer.embeddings"),
        "encoder": bert_encoder_from_state_dict(
            sd, cfg.num_hidden_layers, "transformer.encoder.layer"),
        "pooler": _lin(sd, "transformer.pooler.dense"),
        "modal_proj": _lin(sd, "modal_encoder.proj_embeddings"),
    }
    if "classifier.0.dense.weight" in sd:
        params["classifier"] = {"transform": transform("classifier.0"),
                                "out": _lin(sd, "classifier.1")}
    if "cls.predictions.transform.dense.weight" in sd:
        params["cls"] = {
            "transform": transform("cls.predictions.transform"),
            "decoder_bias": jnp.asarray(_np(sd["cls.predictions.bias"])),
            "seq_relationship": _lin(sd, "cls.seq_relationship"),
        }
    return params


def vilbert_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """ViLBERT layout (vilbert.py ViLBERTBase:982-1118 + optional
    classifier/cls heads).  Accepts MMF full-model prefixes
    (``model.bert.*``)."""
    from transformer_mm_explainability_tpu.utils.convert import (
        bert_embeddings_from_state_dict)

    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    has_bert_prefix = any(k.startswith("bert.") for k in sd)
    if has_bert_prefix:
        sd = {(k.removeprefix("bert.") if k.startswith("bert.") else k): v
              for k, v in sd.items()}

    def block(p):
        out = {
            "q": _lin(sd, f"{p}.attention.self.query"),
            "k": _lin(sd, f"{p}.attention.self.key"),
            "v": _lin(sd, f"{p}.attention.self.value"),
            "out": _lin(sd, f"{p}.attention.output.dense"),
            "out_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "inter": _lin(sd, f"{p}.intermediate.dense"),
            "ffn_out": _lin(sd, f"{p}.output.dense"),
            "ffn_ln": _ln(sd, f"{p}.output.LayerNorm"),
        }
        if f"{p}.attention.self.dyLinear_q.weight" in sd:
            out["dy_q"] = _lin(sd, f"{p}.attention.self.dyLinear_q")
            out["dy_k"] = _lin(sd, f"{p}.attention.self.dyLinear_k")
        return out

    def c_block(p):
        return {
            "q1": _lin(sd, f"{p}.biattention.query1"),
            "k1": _lin(sd, f"{p}.biattention.key1"),
            "v1": _lin(sd, f"{p}.biattention.value1"),
            "q2": _lin(sd, f"{p}.biattention.query2"),
            "k2": _lin(sd, f"{p}.biattention.key2"),
            "v2": _lin(sd, f"{p}.biattention.value2"),
            "dense1": _lin(sd, f"{p}.biOutput.dense1"),
            "ln1": _ln(sd, f"{p}.biOutput.LayerNorm1"),
            "dense2": _lin(sd, f"{p}.biOutput.dense2"),
            "ln2": _ln(sd, f"{p}.biOutput.LayerNorm2"),
            "v_inter": _lin(sd, f"{p}.v_intermediate.dense"),
            "v_out": _lin(sd, f"{p}.v_output.dense"),
            "v_ln": _ln(sd, f"{p}.v_output.LayerNorm"),
            "t_inter": _lin(sd, f"{p}.t_intermediate.dense"),
            "t_out": _lin(sd, f"{p}.t_output.dense"),
            "t_ln": _ln(sd, f"{p}.t_output.LayerNorm"),
        }

    params: Dict[str, Any] = {
        "embeddings": bert_embeddings_from_state_dict(sd, "embeddings"),
        "v_embeddings": {
            "image": _lin(sd, "v_embeddings.image_embeddings"),
            "loc": _lin(sd, "v_embeddings.image_location_embeddings"),
            "ln": _ln(sd, "v_embeddings.LayerNorm"),
        },
        "t_layers": [block(f"encoder.layer.{i}")
                     for i in range(cfg.num_hidden_layers)],
        "v_layers": [block(f"encoder.v_layer.{i}")
                     for i in range(cfg.v_num_hidden_layers)],
        "c_layers": [c_block(f"encoder.c_layer.{i}")
                     for i in range(len(cfg.v_biattention_id))],
        "t_pooler": _lin(sd, "t_pooler.dense"),
        "v_pooler": _lin(sd, "v_pooler.dense"),
    }
    if "classifier.0.dense.weight" in sd:
        params["classifier"] = {
            "transform": {
                "w": jnp.asarray(_np(sd["classifier.0.dense.weight"])),
                "b": jnp.asarray(_np(sd["classifier.0.dense.bias"])),
                "ln": _ln(sd, "classifier.0.LayerNorm")},
            "out": _lin(sd, "classifier.1"),
        }
    if "cls.predictions.transform.dense.weight" in sd:
        params["cls"] = {
            "lm_transform": {
                "w": jnp.asarray(
                    _np(sd["cls.predictions.transform.dense.weight"])),
                "b": jnp.asarray(
                    _np(sd["cls.predictions.transform.dense.bias"])),
                "ln": _ln(sd, "cls.predictions.transform.LayerNorm")},
            "lm_bias": jnp.asarray(_np(sd["cls.predictions.bias"])),
            "bi_seq_relationship": _lin(sd, "cls.bi_seq_relationship"),
            "img_transform": {
                "w": jnp.asarray(
                    _np(sd["cls.imagePredictions.transform.dense.weight"])),
                "b": jnp.asarray(
                    _np(sd["cls.imagePredictions.transform.dense.bias"])),
                "ln": _ln(sd, "cls.imagePredictions.transform.LayerNorm")},
            "img_decoder": _lin(sd, "cls.imagePredictions.decoder"),
        }
    return params


def cnn_lstm_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    n = len(cfg.cnn_input_dims)
    return {
        "word_embedding": jnp.asarray(_np(sd["text_embedding.weight"])),
        "lstm": _birnn(sd, "lstm", bidirectional=True),
        "cnn": [conv_net_from_sd(sd, f"cnn.{i}") for i in range(n)],
        "classifier": mlp_classifier_from_sd(sd, "classifier.module"),
    }
