"""Evaluation: trained-classifier Inception Score + FID."""

from .metrics import fid_from_features, inception_score_from_probs
from .scorer import TrainedScorer, scorer_net

__all__ = [
    "fid_from_features", "inception_score_from_probs", "TrainedScorer",
    "scorer_net",
]
