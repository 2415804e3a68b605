from .config import StarkConfig, FriConfig
from .poly_batch import PolynomialBatch
from .stark import Stark, StarkFrame, ConstraintConsumer

__all__ = [
    "StarkConfig", "FriConfig", "PolynomialBatch",
    "Stark", "StarkFrame", "ConstraintConsumer",
]
