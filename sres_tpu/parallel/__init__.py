from sres_tpu.parallel.mesh import batch_sharding, get_mesh, replicated  # noqa: F401
