from . import query_dsl  # noqa: F401
