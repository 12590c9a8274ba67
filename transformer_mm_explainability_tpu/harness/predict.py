"""Prediction run → EvalAI-style report files (C23/C28).

Re-design of the reference's ``mmf_cli/predict.py`` flow (which sets
``evaluation.predict=true`` and routes through
``TrainerReportingMixin``/``TestReporter``): run a registered model
over a registered MMF dataset in inference mode, convert each batched
report through a prediction processor, and flush timestamped
json/csv files via ``core/test_reporter.TestReporter``.

TPU notes: samples collate to fixed [B, S]/[B, N, D] buckets so one
jitted forward serves the whole dataset; the report rows are host-side.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from transformer_mm_explainability_tpu.core.registry import registry
from transformer_mm_explainability_tpu.core.test_reporter import (
    TestReporter)


def predict_visual_bert(params, cfg, dataset, report_folder: str,
                        dataset_name: str = "vqa2",
                        batch_size: int = 32,
                        label2ans: Optional[Sequence[str]] = None,
                        max_samples: Optional[int] = None,
                        file_format: str = "json",
                        experiment_name: str = "") -> List[str]:
    """VisualBERT classification scores → ``{question_id, answer}``
    rows (the evalai_answer_processor protocol); returns written
    report paths."""
    import jax
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import visual_bert as vb

    fwd = jax.jit(lambda p, ids, mask, feats: vb.forward(
        p, ids, mask, visual_embeddings=feats, cfg=cfg)["scores"])

    proc_cls = registry.get("processor", "prediction.argmax")
    argmax_proc = proc_cls({"id_key": "question_id",
                            "result_key": "answer"})

    def processor(report: Dict[str, Any]) -> List[Dict[str, Any]]:
        rows = argmax_proc({"scores": report["scores"],
                            "id": report["question_id"]})
        if label2ans is not None:
            for row in rows:
                row["answer"] = label2ans[int(row["answer"])]
        return rows

    reporter = TestReporter([dataset_name], report_folder,
                            experiment_name=experiment_name,
                            dataset_type="test",
                            file_format=file_format,
                            prediction_processor=processor)
    reporter.next_dataset()

    if label2ans is not None and len(label2ans) < cfg.num_labels:
        raise ValueError(
            f"label2ans has {len(label2ans)} entries but the model "
            f"predicts {cfg.num_labels} classes — wrong answer vocab?")

    n = len(dataset) if max_samples is None else min(max_samples,
                                                     len(dataset))
    for start in range(0, n, batch_size):
        rows = [dataset[i] for i in range(start,
                                          min(start + batch_size, n))]
        k = len(rows)
        # pad the final partial batch so ONE compiled program serves
        # the whole dataset (no tail-shape recompile)
        rows = rows + [rows[-1]] * (batch_size - k)
        ids = np.stack([np.asarray(r["input_ids"]) for r in rows])
        mask = np.stack([np.asarray(r["input_mask"]) for r in rows])
        feats = np.stack([np.asarray(r["image_feature_0"], np.float32)
                          for r in rows])
        scores = np.asarray(fwd(params, jnp.asarray(ids),
                                jnp.asarray(mask),
                                jnp.asarray(feats)))[:k]
        reporter.add_to_report({
            "scores": scores,
            "question_id": [int(r["question_id"]) for r in rows[:k]]})
    reporter.next_dataset()  # flushes the last dataset
    return reporter.written
