from . import general  # noqa: F401
