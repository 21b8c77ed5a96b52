"""Tier-2 PII detector backed by an HF token-classification model.

Re-creates the capability of the reference's Piiranha-based detector
(``privacy_detector_piiranha.py:122-229``): batched inference over a
token-classification model (e.g. DistilBERT PII), returning
(is_private, confidence) per text.  Runs on CPU via torch (the serving
hot path never touches torch).
"""

from __future__ import annotations

import logging
from typing import List, Tuple

logger = logging.getLogger(__name__)


class PiiModelDetector:
    def __init__(self, model_path: str, threshold: float = 0.5):
        import torch
        from transformers import (
            AutoModelForTokenClassification,
            AutoTokenizer,
        )

        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForTokenClassification.from_pretrained(model_path)
        self.model.eval()
        self.threshold = threshold
        self.id2label = self.model.config.id2label

    def detect_batch(self, texts: List[str]) -> List[Tuple[bool, float]]:
        torch = self.torch
        enc = self.tokenizer(
            texts,
            return_tensors="pt",
            truncation=True,
            max_length=512,
            padding=True,
        )
        with torch.no_grad():
            logits = self.model(**enc).logits  # [B, T, C]
        probs = torch.softmax(logits, dim=-1)
        out = []
        for b in range(len(texts)):
            mask = enc["attention_mask"][b].bool()
            p = probs[b][mask]
            pred = p.argmax(-1)
            conf = p.max(-1).values
            # any non-"O" label above threshold marks PII
            pii_conf = 0.0
            for t in range(len(pred)):
                label = self.id2label.get(int(pred[t]), "O")
                if label != "O" and float(conf[t]) > pii_conf:
                    pii_conf = float(conf[t])
            out.append((pii_conf >= self.threshold, pii_conf if pii_conf > 0 else 0.9))
        return out
