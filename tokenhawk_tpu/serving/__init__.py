from tokenhawk_tpu.serving.server import ServingLoop, serve  # noqa: F401
