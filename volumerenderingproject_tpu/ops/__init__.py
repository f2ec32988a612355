from . import composite, sampling  # noqa: F401
