"""Full LXMERT relprop parity vs reference lxmert_lrp (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_reference

from transformer_mm_explainability_tpu.models import lxmert as jlx
from transformer_mm_explainability_tpu.models import lxmert_lrp as jlx_lrp

from test_lxmert import CFG, B, St, Sv, ref_model, jax_params, make_batch  # noqa: F401


@requires_reference
def test_full_relprop_parity(ref_model, jax_params):
    import torch

    input_ids, mask, feats, pos = make_batch()
    out = ref_model(
        input_ids=torch.tensor(input_ids),
        visual_feats=torch.tensor(feats),
        visual_pos=torch.tensor(pos),
        attention_mask=torch.tensor(mask),
    )
    scores = out.question_answering_score
    targets = scores.argmax(-1).detach()
    one_hot_np = np.zeros((B, CFG.num_qa_labels), np.float32)
    one_hot_np[np.arange(B), targets.numpy()] = 1

    ref_model.relprop(torch.tensor(one_hot_np), alpha=1)

    # jax side
    jout = jlx.forward(
        jax_params, jnp.asarray(input_ids), jnp.asarray(mask),
        jnp.asarray(feats), jnp.asarray(pos), cfg=CFG, return_tape=True)
    cam_lang, cam_vis, cams = jlx_lrp.relprop(
        jax_params, jout["tape"], jnp.asarray(one_hot_np),
        jout["tape"]["lang_mask"], jout["tape"]["visn_mask"], CFG)

    enc = ref_model.lxmert.encoder

    def chk(got, module, msg, atol=2e-3):
        want = module.get_attn_cam()
        if want is None:
            np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6,
                                       err_msg=f"{msg}: expected zero cam")
            return
        want = want.detach().numpy()
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got) / scale, want / scale,
                                   atol=atol, err_msg=msg)

    for i, blk in enumerate(enc.x_layers):
        chk(cams.x_lang_cross[i], blk.visual_attention.att, f"x_lc {i}")
        chk(cams.x_visn_cross[i], blk.visual_attention_copy.att, f"x_vc {i}")
        chk(cams.x_lang_self[i], blk.lang_self_att.self, f"x_ls {i}")
        chk(cams.x_visn_self[i], blk.visn_self_att.self, f"x_vs {i}")
    for i, blk in enumerate(enc.r_layers):
        chk(cams.visn[i], blk.attention.self, f"visn {i}")
    for i, blk in enumerate(enc.layer):
        chk(cams.lang[i], blk.attention.self, f"lang {i}")
