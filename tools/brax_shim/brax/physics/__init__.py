from brax.physics import config_pb2  # noqa: F401
