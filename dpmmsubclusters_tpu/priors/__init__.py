from .base import Family
from .niw import GAUSSIAN, GaussianFamily
from .dirichlet import MULTINOMIAL, MultinomialFamily

__all__ = [
    "Family",
    "GAUSSIAN",
    "GaussianFamily",
    "MULTINOMIAL",
    "MultinomialFamily",
]
