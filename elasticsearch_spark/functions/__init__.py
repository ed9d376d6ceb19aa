from . import analysis, scoring, textstats  # noqa: F401
