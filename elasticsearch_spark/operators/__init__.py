from . import match  # noqa: F401
