"""Convert reference-format tokenizer pattern JSONs into conformer_tpu specs.

The reference keeps tokenizer pattern data in ``tokenizer/*.json`` with 17+
top-level keys consumed positionally by its processor
(reference: processing/processor.py:76-123). This tool normalizes any of those
schemas (vi.json / english.json / en.json — the latter two are mutually
incompatible in the reference) into the single spec schema used by
:mod:`conformer_tpu.text.tokenizer`, defaulting missing groups to empty.

Usage:
    python tools/convert_tokenizer.py SRC.json conformer_tpu/text/specs/vi.json --language vi
"""

from __future__ import annotations

import argparse
import json

GROUP_KEYS = (
    "single_vowel", "composed_vowel", "single_consonant", "no_split",
    "voiced", "voiceless", "voiced_special", "voiceless_special",
    "exceptions", "short_item", "single_suffix", "composed_suffix",
    "no_split_suffix", "mix",
)

# Alternate names seen in the wild (reference tokenizer/en.json).
ALIASES = {
    "exceptions": ("exceptions", "exception"),
    "no_split": ("no_split", "composed_consonant"),
}


def convert(src: dict, language: str) -> dict:
    groups = {}
    for key in GROUP_KEYS:
        for name in ALIASES.get(key, (key,)):
            if name in src:
                groups[key] = list(src[name])
                break
        else:
            groups[key] = []
    return {
        "schema": "conformer_tpu/grapheme-spec/v1",
        "language": language,
        "groups": groups,
        "replace": dict(src.get("replace", {})),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--language", default="vi")
    args = p.parse_args()
    with open(args.src, encoding="utf8") as f:
        src = json.load(f)
    spec = convert(src, args.language)
    with open(args.dst, "w", encoding="utf8") as f:
        json.dump(spec, f, ensure_ascii=False, indent=1, sort_keys=True)
        f.write("\n")
    vocab = 1 + sum(len(spec["groups"][k]) for k in (
        "single_vowel", "composed_vowel", "single_consonant", "no_split",
        "voiced", "voiceless", "voiced_special", "voiceless_special",
        "exceptions", "short_item", "no_split_suffix")) + 2
    print(f"wrote {args.dst}: vocab_size={vocab}")


if __name__ == "__main__":
    main()
