from brax.envs import ant, env  # noqa: F401
