"""MMF model-zoo tour: build three VQA-family models from the registry
and the shipped configs, run a forward on synthetic inputs, and score
with the registered metrics/losses.

Run: python examples/mmf_zoo_vqa.py
(CPU-friendly tiny shapes; real weights load via utils/mmf_loader.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.core import losses as losses_lib
from transformer_mm_explainability_tpu.core import metrics as metrics_lib
from transformer_mm_explainability_tpu.models import mmf_zoo as Z
from transformer_mm_explainability_tpu.models import movie_mcan as MM
from transformer_mm_explainability_tpu.zoo import registry


def main():
    rs = np.random.RandomState(0)
    B, A = 4, 12

    # --- Pythia (registry name "pythia") -------------------------------
    pcfg = Z.PythiaConfig(vocab_size=50, num_answers=A, embedding_dim=16,
                          text_hidden_dim=24, conv1_out=12, conv2_out=2,
                          image_feature_dim=32, combine_hidden_dim=20,
                          classifier_text_hidden=8,
                          classifier_img_hidden=10)
    pparams = Z.init_pythia(jax.random.PRNGKey(0), pcfg)
    toks = jnp.asarray(rs.randint(1, 50, (B, 6)))
    feats = [jnp.asarray(rs.randn(B, 9, 32).astype(np.float32))
             for _ in pcfg.image_encoders]
    scores = jax.jit(lambda p, t, f: Z.pythia_forward(p, pcfg, t, f)
                     )(pparams, toks, feats)
    print("pythia scores", scores.shape)

    # --- MoVie+MCAN (registry name "movie_mcan") -----------------------
    mcfg = MM.MovieMcanConfig(vocab_size=50, num_answers=A,
                              embedding_dim=16, hidden_dim=16,
                              num_attn=4, num_layers=2,
                              cbn_num_layers=1, image_feature_dim=12,
                              cbn_out_dim=16)
    mparams = MM.init_movie_mcan(jax.random.PRNGKey(1), mcfg)
    grid = jnp.asarray(rs.randn(B, 12, 2, 3).astype(np.float32))
    mm_scores = MM.movie_mcan_forward(mparams, mcfg, toks, grid,
                                      training=True)
    print("movie_mcan training scores", mm_scores.shape)  # [B, 3, A]

    # --- registered loss + metric --------------------------------------
    soft = rs.rand(B, A).astype(np.float32) * (rs.rand(B, A) > 0.5)
    sl = {"targets": jnp.asarray(soft), "dataset_type": "val",
          "dataset_name": "vqa2"}
    loss = losses_lib.Losses(["triple_logit_bce"])(
        sl, {"scores": mm_scores})
    acc = metrics_lib.Metrics(["vqa_accuracy"])(
        sl, {"scores": mm_scores})
    print({k: float(v[0]) for k, v in loss.items()})
    print(acc)

    # every model name the reference registers resolves here:
    print("registered models:", ", ".join(registry.list("model")))


if __name__ == "__main__":
    main()
