from tokenhawk_tpu.utils.timing import TokenTimer, descriptive_stats  # noqa: F401
