from .webgen import generate_pages  # noqa: F401
