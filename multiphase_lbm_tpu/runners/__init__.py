from . import apps, common, coolbm  # noqa: F401
