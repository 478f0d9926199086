"""Evaluation: Inception Score + FID.

Two scorer backends:

* :class:`Inception2015` — the reference's exact frozen-graph protocol
  (tflib/inception_score.py), TF-free, from a user-supplied weight file;
  scores are comparable to the reference's published IS artifacts.
* :class:`TrainedScorer` — self-contained train-your-own-classifier fallback
  (LSUN_bedrooms/inception_score.py protocol); always available, NOT
  numerically comparable to Inception-2015 scores.
"""

from .inception2015 import Inception2015, find_inception_file
from .metrics import fid_from_features, inception_score_from_probs
from .scorer import TrainedScorer, scorer_net

__all__ = [
    "Inception2015", "find_inception_file", "fid_from_features",
    "inception_score_from_probs", "TrainedScorer", "scorer_net",
]
