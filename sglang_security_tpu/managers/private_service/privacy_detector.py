"""Tier-1 privacy detector: word-trie + compiled regex pattern library.

Re-creates the reference's ``privacy_detector_custom.py`` capability
(Trie for word lists, compiled regexes for structured PII, custom handler
hooks, confidence scoring, JSON-configurable pattern library).  The
default pattern library covers the same categories as the reference's
``privacy_patterns_config.json``: email, SSN, credit card, phone, IP,
API keys/secrets, plus a keyword trie for sensitive-topic words.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

DEFAULT_PATTERNS: Dict[str, str] = {
    "email": r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b(?:\d[ -]*?){13,16}\b",
    # leading \b would fail before "(" (non-word char), so anchor with a
    # lookbehind instead: "(555) 010-1234" must match
    "phone": r"(?<![\w(])(?:\+?\d{1,3}[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]?\d{3}[-. ]?\d{4}\b",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)\b",
    "api_key": r"\b(?:sk|pk|rk|key|token)[-_][A-Za-z0-9_\-]{16,}\b",
    "aws_key": r"\bAKIA[0-9A-Z]{16}\b",
    "iban": r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b",
    "password_assign": r"(?i)\b(password|passwd|pwd)\s*[:=]\s*\S+",
}

DEFAULT_KEYWORDS = [
    "password", "secret", "ssn", "social security", "credit card",
    "bank account", "routing number", "passport", "diagnosis",
    "medical record", "salary", "api key", "private key", "confidential",
    "address", "date of birth",
]


class Trie:
    """Word trie for multi-word keyword matching (case-insensitive)."""

    def __init__(self):
        self.root: dict = {}

    def add(self, phrase: str) -> None:
        node = self.root
        for w in phrase.lower().split():
            node = node.setdefault(w, {})
        node["$"] = phrase

    def find(self, text: str) -> List[str]:
        words = re.findall(r"[a-z0-9']+", text.lower())
        hits = []
        for i in range(len(words)):
            node = self.root
            j = i
            while j < len(words) and words[j] in node:
                node = node[words[j]]
                j += 1
                if "$" in node:
                    hits.append(node["$"])
        return hits


@dataclass
class DetectionResult:
    is_private: bool
    confidence: float  # 0..1; mid-band escalates to tier 2
    categories: List[str] = field(default_factory=list)


class PrivacyDetector:
    def __init__(
        self,
        patterns: Optional[Dict[str, str]] = None,
        keywords: Optional[List[str]] = None,
        custom_handlers: Optional[Dict[str, Callable[[str], bool]]] = None,
    ):
        self.patterns = {
            k: re.compile(v) for k, v in (patterns or DEFAULT_PATTERNS).items()
        }
        self.keywords = list(keywords or DEFAULT_KEYWORDS)
        self.trie = Trie()
        for kw in self.keywords:
            self.trie.add(kw)
        self.custom_handlers = custom_handlers or {}
        self.stats: Dict[str, int] = {}

    # -- config persistence (parity with reference config load/save) --
    @classmethod
    def from_config_file(cls, path: str) -> "PrivacyDetector":
        with open(path) as f:
            cfg = json.load(f)
        return cls(cfg.get("patterns"), cfg.get("keywords"))

    def save_config(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "patterns": {k: p.pattern for k, p in self.patterns.items()},
                    "keywords": self.keywords,
                },
                f,
                indent=1,
            )

    # -------------------------------------------------------------- detect
    def detect(self, text: str) -> DetectionResult:
        cats: List[str] = []
        for name, pat in self.patterns.items():
            if pat.search(text):
                cats.append(name)
                self.stats[name] = self.stats.get(name, 0) + 1
        kw_hits = self.trie.find(text)
        for name, fn in self.custom_handlers.items():
            try:
                if fn(text):
                    cats.append(f"custom:{name}")
            except Exception:
                pass
        if cats:
            return DetectionResult(True, 0.95, cats)
        if kw_hits:
            # keyword-only: ambiguous -> mid confidence, escalate to tier 2
            return DetectionResult(True, 0.5, [f"kw:{k}" for k in kw_hits])
        return DetectionResult(False, 0.9, [])
