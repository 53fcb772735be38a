from . import shan_chen  # noqa: F401
