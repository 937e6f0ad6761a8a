from kspider_tpu.io import phmap, sigs, artifacts  # noqa: F401
