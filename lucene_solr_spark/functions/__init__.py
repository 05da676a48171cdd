from . import valuesources  # noqa: F401
