"""Demo/benchmark driver: trains Basic and Regex tokenizers on a corpus and
saves the models (the reference's train.py:11-27 workflow, with a CLI).

    python train.py [--corpus PATH] [--vocab-size 512] [--outdir models_out]
                    [--tokenizers basic,regex] [--pattern gpt4|gpt2]
                    [--select-mode auto|fused|fused_xl|sortloop|stepped|sparse|sort|dense]
                    [--checkpoint-every N] [--resume] [--profile-dir DIR]
"""

import argparse
import os
import time

from minbpe_tpu import BasicTokenizer, RegexTokenizer, GPT2_SPLIT_PATTERN

DEFAULT_CORPUS = "/root/reference/tests/taylorswift.txt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=DEFAULT_CORPUS)
    ap.add_argument("--vocab-size", type=int, default=512)
    ap.add_argument("--outdir", default="models_out")
    ap.add_argument("--tokenizers", default="basic,regex")
    ap.add_argument("--pattern", choices=["gpt4", "gpt2"], default="gpt4")
    ap.add_argument("--select-mode", default="auto")
    ap.add_argument("--checkpoint-every", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint in --outdir")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax profiler trace here")
    ap.add_argument("--distributed", action="store_true",
                    help="train over the full device mesh "
                    "(parallel/train.py; supports --checkpoint-every/"
                    "--resume via the stepped distributed trainer)")
    ap.add_argument("--selection", default="dense",
                    choices=["dense", "sparse", "owner"],
                    help="distributed selection mode")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    text = open(args.corpus, encoding="utf-8").read()
    os.makedirs(args.outdir, exist_ok=True)
    pattern = GPT2_SPLIT_PATTERN if args.pattern == "gpt2" else None

    t0 = time.time()
    for name in args.tokenizers.split(","):
        name = name.strip()
        if name == "basic":
            tok = BasicTokenizer()
        elif name == "regex":
            tok = RegexTokenizer(pattern=pattern)
        else:
            raise SystemExit(f"unknown tokenizer {name!r}")
        opts = {"select_mode": args.select_mode}
        ck = os.path.join(args.outdir, f"{name}.ckpt.npz")
        if args.distributed:
            from minbpe_tpu.parallel.train import (
                train_bytes_distributed, train_chunks_distributed,
            )

            t1 = time.time()
            if name == "basic":
                tok.merges, tok.vocab = train_bytes_distributed(
                    text.encode("utf-8"), args.vocab_size - 256,
                    verbose=not args.quiet)
            else:
                tok.merges, tok.vocab = train_chunks_distributed(
                    tok._split_chunks(text), args.vocab_size - 256,
                    verbose=not args.quiet, selection=args.selection,
                    checkpoint_path=ck if args.checkpoint_every else None,
                    checkpoint_every=args.checkpoint_every,
                    resume_from=ck if args.resume and os.path.exists(ck)
                    else None)
            tok._invalidate_device_state()
            print(f"{name}: trained vocab {args.vocab_size} distributed in "
                  f"{time.time()-t1:.2f}s")
            tok.save(os.path.join(args.outdir, name))
            continue
        # checkpoints need a host-stepped loop; dense counting caps at
        # DENSE_SELECT_MAX vocab, above that the sort-round loop takes over
        from minbpe_tpu.ops.train import DENSE_SELECT_MAX

        ck_mode = "stepped" if args.vocab_size <= DENSE_SELECT_MAX \
            else "sortloop"
        if args.checkpoint_every:
            opts.update(checkpoint_path=ck,
                        checkpoint_every=args.checkpoint_every,
                        select_mode=ck_mode)
        if args.resume and os.path.exists(ck):
            opts.update(resume_from=ck, select_mode=ck_mode)
        if args.profile_dir:
            opts.update(profile_dir=args.profile_dir)
        t1 = time.time()
        tok.train(text, args.vocab_size, verbose=not args.quiet, **opts)
        print(f"{name}: trained vocab {args.vocab_size} in "
              f"{time.time()-t1:.2f}s")
        tok.save(os.path.join(args.outdir, name))
    print(f"total: {time.time()-t0:.2f} seconds")


if __name__ == "__main__":
    main()
