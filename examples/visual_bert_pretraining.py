"""VisualBERT masked pretraining — the MMF ``masked_coco`` feed end to
end (VisualBERT/projects/visual_bert/configs/masked_coco/ protocol).

    python examples/visual_bert_pretraining.py \
        [--annotations imdb.npy --features feats_dir] \
        [--steps 50] [--batch-size 8] [--lr 5e-5]

With ``--annotations/--features`` this trains on a real MMF-layout
masked-COCO store (two-sentence sampling + masked tokens + masked
regions → masked-LM loss through the tied-decoder head).  Without
them it builds a synthetic store and runs a smoke pass, printing the
loss curve either way.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_store(root: str, n_images: int = 16, n_boxes: int = 5,
                    feat_dim: int = 2048):
    rng = np.random.RandomState(0)
    ann = [{"image_id": i,
            "captions": [f"w{i % 7} w{(i + 1) % 7} w3 w4",
                         f"w{i % 7} w5 w6"]} for i in range(n_images)]
    np.save(os.path.join(root, "ann.npy"),
            np.array([{"metadata": True}] + ann, dtype=object))
    for i in range(n_images):
        np.save(os.path.join(root, f"{i}.npy"),
                rng.rand(n_boxes, feat_dim).astype(np.float32))
    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"w{i}" for i in range(30)])}
    return os.path.join(root, "ann.npy"), root, vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotations")
    ap.add_argument("--features")
    ap.add_argument("--vocab-file", help="bert vocab.txt")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--max-seq-length", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from transformer_mm_explainability_tpu.data import masked_datasets
    from transformer_mm_explainability_tpu.models import bert as jbert
    from transformer_mm_explainability_tpu.models import visual_bert as vb

    tmp = None
    vocab = None
    if args.annotations is None:
        tmp = tempfile.mkdtemp(prefix="vb_pretrain_")
        args.annotations, args.features, vocab = synthetic_store(tmp)
        print(f"[synthetic masked-coco store in {tmp}]")
    elif not args.vocab_file:
        sys.exit("--vocab-file vocab.txt (bert-base-uncased layout) is "
                 "required with --annotations")

    tk = ({"vocab_path": args.vocab_file} if args.vocab_file
          else {"vocab": vocab})
    cfg = {
        "annotations": args.annotations,
        "features": args.features,
        "max_features": 5 if tmp else 100,
        "use_image_feature_masks": True,
        "two_sentence": True,
        "seed": 7,
        "processors": {
            "masked_token_processor": {
                "type": "masked_token",
                "params": {"tokenizer_config": tk,
                           "max_seq_length": args.max_seq_length,
                           "mask_probability": 0.15, "seed": 4}},
            "masked_region_processor": {
                "type": "masked_region", "params": {"seed": 5}},
        },
    }
    ds = masked_datasets.MaskedCOCODataset("masked_coco", cfg, "train")
    print(f"dataset: {len(ds)} samples")

    feat_dim = np.asarray(ds[0]["image_feature_0"]).shape[-1]
    if tmp:
        mcfg = vb.VisualBERTConfig(
            bert=jbert.BertConfig(
                vocab_size=35, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64),
            visual_embedding_dim=feat_dim)
    else:
        mcfg = vb.VisualBERTConfig(visual_embedding_dim=feat_dim)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    state = {"p": vb.init_params(k1, mcfg),
             "h": vb.init_pretrain_params(k2, mcfg)}

    def batch_at(step: int):
        idx = [(step * args.batch_size + j) % len(ds)
               for j in range(args.batch_size)]
        rows = [ds[i] for i in idx]
        return {
            "input_ids": np.stack(
                [np.asarray(r["input_ids"]) for r in rows]),
            "input_mask": np.stack(
                [np.asarray(r["input_mask"]) for r in rows]),
            "segment_ids": np.stack(
                [np.asarray(r["segment_ids"]) for r in rows]),
            "lm_label_ids": np.stack(
                [np.asarray(r["lm_label_ids"]) for r in rows]),
            "feats": np.stack(
                [np.asarray(r["image_feature_0"], np.float32)
                 for r in rows]),
        }

    def loss_fn(st, batch):
        out = vb.pretrain_forward(
            st["p"], st["h"], batch["input_ids"], batch["input_mask"],
            visual_embeddings=batch["feats"],
            # segment 1 marks the paired second caption — the
            # two-sentence protocol's signal
            token_type_ids=batch["segment_ids"],
            masked_lm_labels=batch["lm_label_ids"], cfg=mcfg)
        return out["loss"]

    tx = optax.adamw(args.lr)
    opt = tx.init(state)

    @jax.jit
    def step_fn(st, opt, batch):
        loss, grads = jax.value_and_grad(loss_fn)(st, batch)
        updates, opt = tx.update(grads, opt, st)
        return optax.apply_updates(st, updates), opt, loss

    for step in range(args.steps):
        b = {k: jnp.asarray(v) for k, v in batch_at(step).items()}
        state, opt, loss = step_fn(state, opt, b)
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            print(f"step {step:4d}  masked_lm_loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
