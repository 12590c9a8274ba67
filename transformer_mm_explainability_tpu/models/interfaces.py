"""Pretrained-model interfaces (C34).

Re-design of ``VisualBERT/mmf/models/interfaces/mmbt.py``
(MMBTGridHMInterface:25-85): the user-facing ``classify(image, text)``
entry for MMBT-Grid on Hateful Memes — processor pipeline, grid
encoding, softmax'd verdict.

The interface is host-side orchestration; the compute path (ResNet152
grid encoder + MMBT classifier) is jitted with params passed as
arguments (never baked into the trace).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.models import encoders as E
from transformer_mm_explainability_tpu.models import mmbt as jmmbt


def _load_image(image: Union[str, np.ndarray]) -> np.ndarray:
    """Path/array → float32 CHW in [0, 1].  URL download is offline-
    gated (interfaces/mmbt.py:61-66 downloads; this image has no
    egress, so URLs raise)."""
    if isinstance(image, str):
        if image.startswith("http"):
            raise RuntimeError(
                "offline image: pass a local path or array, not a URL")
        from PIL import Image
        image = np.asarray(Image.open(image).convert("RGB"))
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[-1] == 3:  # HWC → CHW
        image = np.moveaxis(image, -1, 0)
    # dtype-keyed rescale (torchvision ToTensor semantics): integer
    # inputs are 0-255, floats are assumed already scaled
    if np.issubdtype(image.dtype, np.integer):
        return image.astype(np.float32) / 255.0
    return image.astype(np.float32)


class MMBTGridHMInterface:
    """MMBTGridHMInterface (interfaces/mmbt.py:25-85).

    ``params`` holds {"mmbt": ..., "image_encoder": ...};
    ``text_processor`` is a bert_tokenizer-style processor returning
    input_ids/input_mask/segment_ids; ``image_processor`` maps a CHW
    float image to the encoder's input (e.g. TorchvisionTransforms).
    """

    def __init__(self, params: Dict[str, Any], cfg: jmmbt.MMBTConfig,
                 text_processor: Callable,
                 image_processor: Optional[Callable] = None,
                 image_encoder: Optional[E.ResNet152ImageEncoder] = None):
        self.params = params
        self.cfg = cfg
        self.text_processor = text_processor
        self.image_processor = image_processor
        self.image_encoder = (image_encoder
                              or E.ResNet152ImageEncoder(
                                  {"num_output_features": -1}))
        self._forward = jax.jit(functools.partial(self._fwd, cfg=cfg))

    def _fwd(self, params, image, input_ids, input_mask, segment_ids,
             *, cfg):
        grid = self.image_encoder.apply(params["image_encoder"], image)
        # MMBTBase.forward (mmbt.py:375-381): the modal stream is
        # wrapped in the text [CLS]/[SEP] embeddings; with an end
        # token the text side drops its leading [CLS]
        # (extract_modal_end_token, mmbt.py:338-363)
        modal_start = modal_end = None
        if cfg.use_modal_start_token:
            modal_start = input_ids[:, 0]
        if cfg.use_modal_end_token:
            gather = (input_mask.sum(axis=1) - 1)[:, None]
            modal_end = jnp.take_along_axis(input_ids, gather,
                                            axis=1)[:, 0]
            input_ids = jnp.concatenate(
                [input_ids[:, 1:], input_ids[:, -1:]], axis=1)
            input_mask = jnp.concatenate(
                [input_mask[:, 1:],
                 jnp.zeros_like(input_mask[:, :1])], axis=1)
        scores = jmmbt.mmbt_for_classification(
            params["mmbt"], cfg,
            input_modal=grid, input_ids=input_ids,
            attention_mask=input_mask, token_type_ids=segment_ids,
            modal_start_token=modal_start, modal_end_token=modal_end)
        return jax.nn.softmax(scores, axis=1)

    def classify(self, image: Union[str, np.ndarray], text: str
                 ) -> Dict[str, float]:
        """interfaces/mmbt.py:43-85: {"label": 0|1, "confidence": p}."""
        img = _load_image(image)
        if self.image_processor is not None:
            out = self.image_processor({"image": img})
            img = out["image"] if isinstance(out, dict) else out
        toks = self.text_processor({"text": text})
        probs = self._forward(
            self.params,
            jnp.asarray(img)[None],
            jnp.asarray(toks["input_ids"])[None],
            jnp.asarray(toks["input_mask"])[None],
            jnp.asarray(toks["segment_ids"])[None])
        label = int(jnp.argmax(probs[0]))
        return {"label": label, "confidence": float(probs[0, label])}
