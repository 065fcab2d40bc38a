from .gaussians import GaussianModel, from_points, init_random  # noqa: F401
