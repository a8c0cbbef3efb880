from ema_tpu.index.build import ReferenceIndex, build_index  # noqa: F401
