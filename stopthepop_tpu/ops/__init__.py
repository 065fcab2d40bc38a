from . import covariance, sh, sort, stopthepop, transforms  # noqa: F401
