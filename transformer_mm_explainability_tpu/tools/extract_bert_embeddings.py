"""BERT [CLS] embedding extraction for imdb questions (C29 tooling).

Re-design of
``VisualBERT/tools/scripts/bert/extract_bert_embeddings.py``: for each
imdb entry, tokenize ``question_str`` ([CLS] q [SEP]), run the
TPU-native BERT encoder (``models/bert``), and save the final-layer
[CLS] vector as ``<out_path><question_id>.npy`` (:33-48), with the
``idx % n_groups == group_id`` worker sharding (:44-45).

TPU notes: the reference runs one question at a time; here questions
are padded to a shared length and batched so the encoder sees one
[B, L, H] matmul workload per chunk.
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Optional

import numpy as np


def extract_bert(params, cfg, tokenizer, imdb, out_path: str,
                 group_id: int = 0, n_groups: int = 1,
                 max_seq_length: int = 64,
                 batch_size: int = 32) -> List[str]:
    """→ written paths.  ``imdb`` rows need question_str/question_id
    (header row already stripped, like the reference's ``imdb[1:]``)."""
    import jax
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import bert as jbert
    from transformer_mm_explainability_tpu.ops.attention import layer_norm

    @jax.jit
    def fwd(p, ids, mask):
        h = jbert.text_embeddings(p["emb"], ids)
        h = layer_norm(h, p["emb"]["ln"]["scale"], p["emb"]["ln"]["bias"],
                       cfg.layer_norm_eps)
        h, _ = jbert.encoder(p["enc"], h, cfg,
                             mask=jbert.extended_attention_mask(mask))
        return h[:, 0]  # final-layer [CLS] (:30)

    todo = [el for idx, el in enumerate(imdb)
            if idx % n_groups == group_id]
    written: List[str] = []
    for i in range(0, len(todo), batch_size):
        chunk = todo[i:i + batch_size]
        ids = np.zeros((len(chunk), max_seq_length), np.int32)
        mask = np.zeros((len(chunk), max_seq_length), np.int32)
        for j, el in enumerate(chunk):
            enc = tokenizer.encode_vqa(el["question_str"], max_seq_length)
            ids[j] = enc["input_ids"]
            mask[j] = enc["input_mask"]
        cls = np.asarray(fwd(params, jnp.asarray(ids), jnp.asarray(mask)))
        for j, el in enumerate(chunk):
            save_path = out_path + str(el["question_id"]) + ".npy"
            np.save(save_path, cls[j])
            written.append(save_path)
    return written


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--imdb_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="HF bert-base state dict; random if omitted")
    parser.add_argument("--group_id", type=int, default=0)
    parser.add_argument("--n_groups", type=int, default=1)
    args = parser.parse_args(argv)

    import jax

    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)
    from transformer_mm_explainability_tpu.models import bert as jbert

    cfg = jbert.BERT_BASE
    if args.checkpoint:
        import torch

        from transformer_mm_explainability_tpu.utils import convert

        sd = torch.load(args.checkpoint, map_location="cpu")
        # HF dumps carry a "bert." prefix; bare encoders do not
        root = "bert." if any(k.startswith("bert.") for k in sd) else ""
        params = {
            "emb": convert.bert_embeddings_from_state_dict(
                sd, prefix=root + "embeddings"),
            "enc": convert.bert_encoder_from_state_dict(
                sd, cfg.num_hidden_layers, prefix=root + "encoder.layer"),
        }
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"emb": jbert.init_embedding_params(k1, cfg),
                  "enc": jbert.init_encoder_params(k2, cfg)}
    tokenizer = BertTokenizer(args.vocab_file)
    imdb = np.load(args.imdb_path, allow_pickle=True)[1:]
    written = extract_bert(params, cfg, tokenizer, imdb, args.out_path,
                           args.group_id, args.n_groups)
    print(f"wrote {len(written)} embeddings")


if __name__ == "__main__":
    main()
