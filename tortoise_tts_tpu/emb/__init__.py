from . import mel  # noqa: F401
