from sres_tpu.models.registry import build_model, model_names, resolve_parms  # noqa: F401
