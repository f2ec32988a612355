from . import transforms, config, imageio  # noqa: F401
