"""Build LM artifacts from a text corpus: lm_text.txt, lexicon.txt, lm.arpa.

Native replacement for the reference LM builder (reference: create_lm.py:10-63),
which shells out to an externally compiled KenLM lmplz binary (create_lm.py:60).
Here the ARPA is trained by the in-repo C++ modified-Kneser-Ney builder
(native/ngram_lm.cpp).

    python -m conformer_tpu.cli.create_lm --text corpus.txt --out lm_dir
"""

from __future__ import annotations

import argparse
import os

from conformer_tpu.cli.common import (add_common_args, load_config,
                                      load_tokenizer_from_args)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    add_common_args(p)
    p.add_argument("--text", required=True, help="input corpus, one sentence per line")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--order", type=int, default=5)
    p.add_argument("--token-level", action="store_true",
                   help="additionally train lm_tokens.arpa over grapheme-"
                        "token sequences (for on-device beam-search LM "
                        "fusion, decode.device_lm_path)")
    p.add_argument("--token-order", type=int, default=5)
    args = p.parse_args(argv)

    # Respect a config's train.tokenizer_path like every other entry point —
    # LM artifacts (lexicon, token-level corpus) must use the run's tokenizer
    # or the vocab won't match the model at decode time.
    cfg = load_config(args)
    tok = load_tokenizer_from_args(args, cfg)
    os.makedirs(args.out, exist_ok=True)

    # Clean + uppercase corpus (reference: create_lm.py:26-31).
    texts = []
    with open(args.text, encoding="utf8") as f:
        for line in f:
            cleaned = tok.clean_text(str(line).upper())
            if cleaned:
                texts.append(cleaned)
    lm_text = os.path.join(args.out, "lm_text.txt")
    with open(lm_text, "w", encoding="utf8") as f:
        f.write("\n".join(texts))

    # Lexicon: word -> graphemes + delimiter (reference: create_lm.py:39-57),
    # skipping words whose segmentation contains <UNK>.
    seen = set()
    lexicon = []
    for text in texts:
        for word in text.split(" "):
            if not word or word in seen:
                continue
            seen.add(word)
            graphemes = tok.word2graphemes(word)
            if tok.unk_token in graphemes:
                continue
            lexicon.append(f"{word} {' '.join(graphemes)} {tok.delim_token}")
    with open(os.path.join(args.out, "lexicon.txt"), "w", encoding="utf8") as f:
        f.write("\n".join(lexicon))

    # ARPA via the native builder (replaces the lmplz subprocess).
    from conformer_tpu.lm.ngram import build_arpa

    arpa = os.path.join(args.out, "lm.arpa")
    build_arpa(lm_text, arpa, order=args.order)
    print(f"wrote {lm_text}, lexicon.txt ({len(lexicon)} words), {arpa}")

    if args.token_level:
        # Token-level corpus: each sentence as space-joined grapheme tokens
        # (word delimiters included), for the device beam search's
        # HBM-resident LM tables (lm/device_table.py).
        tok_text = os.path.join(args.out, "lm_tokens.txt")
        with open(tok_text, "w", encoding="utf8") as f:
            for text in texts:
                ids = tok.encode(text)
                f.write(" ".join(tok.vocab[i] for i in ids) + "\n")
        tok_arpa = os.path.join(args.out, "lm_tokens.arpa")
        build_arpa(tok_text, tok_arpa, order=args.token_order)
        print(f"wrote {tok_text}, {tok_arpa} (token-level, "
              f"order {args.token_order})")


if __name__ == "__main__":
    main()
