from transformer_mm_explainability_tpu.ops import relevancy  # noqa: F401
