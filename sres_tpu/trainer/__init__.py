from sres_tpu.trainer.trainer import ModelTrainer  # noqa: F401
