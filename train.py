"""Demo/benchmark driver: trains Basic and Regex tokenizers to vocab 512 on
the Taylor Swift corpus and saves the models (the reference's train.py:11-27
workflow, with a CLI).

    python train.py [--corpus PATH] [--vocab-size 512] [--outdir models_out]
"""

import argparse
import os
import time

from minbpe_tpu import BasicTokenizer, RegexTokenizer

DEFAULT_CORPUS = "/root/reference/tests/taylorswift.txt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=DEFAULT_CORPUS)
    ap.add_argument("--vocab-size", type=int, default=512)
    ap.add_argument("--outdir", default="models_out")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    text = open(args.corpus, encoding="utf-8").read()
    os.makedirs(args.outdir, exist_ok=True)

    t0 = time.time()
    for name, factory in [("basic", BasicTokenizer), ("regex", RegexTokenizer)]:
        tok = factory()
        t1 = time.time()
        tok.train(text, args.vocab_size, verbose=not args.quiet)
        print(f"{name}: trained vocab {args.vocab_size} in {time.time()-t1:.2f}s")
        tok.save(os.path.join(args.outdir, name))
    print(f"total: {time.time()-t0:.2f} seconds")


if __name__ == "__main__":
    main()
