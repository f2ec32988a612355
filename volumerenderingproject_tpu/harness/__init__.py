from . import cli, goldens, profiling  # noqa: F401
