from .preprocess import PreprocessOutput, preprocess  # noqa: F401
from .naive import render_global_naive, render_full_sort_naive  # noqa: F401
