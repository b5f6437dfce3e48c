"""SOLA-TPU: a TPU-native (JAX/XLA/Pallas) referring video object segmentation
framework with the capabilities of cvlab-kaist/SOLA.

Two decoupled stages communicating through files on disk (same contract as the
reference, SURVEY.md §0):

1. Track generation (``sola_tpu.trackgen``): SAM2-in-JAX video propagation of
   grid / GroundingDINO / GT prompts into per-track masklets + object tokens.
2. Track selection (``sola_tpu.models.selection`` + train/eval/inference): a
   language-aligned transformer scoring tracks against RoBERTa text
   embeddings, OR-merging selected masklets, scored with J&F.
"""

__version__ = "0.1.0"
