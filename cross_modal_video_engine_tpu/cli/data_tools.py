"""Data preparation utilities.

Parity surfaces for the LINAS util tools:
  * txt2bin          (util/txt2bin.py:21-76: `id f f f...` text -> BigFile)
  * combine_features (util/combine_features.py: concat two BigFiles along
                      the feature axis for shared ids)
  * format_check     (util/format_check.py:5-33: caption/feature
                      consistency checks)
  * build_vocab      (util/vocab.py main: caption file -> vocab json)
  * build_tags       (util/get_concept_tags.py: captions -> weighted tag
                      file + tag vocab)

Usage: python -m cross_modal_video_engine_tpu.cli.data_tools CMD ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..io.bigfile import BigFile, write_bigfile
from ..utils.concept_tags import (build_tag_vocab, video_tag_scores,
                                  write_tag_file)
from ..utils.vocab import build_vocab, captions_from_txt


def txt2bin(args):
    names, rows = [], []
    with open(args.input) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            names.append(parts[0])
            rows.append(np.asarray(parts[1:], np.float32))
    mat = np.stack(rows)
    write_bigfile(args.output, names, mat)
    print(f"wrote {mat.shape[0]}x{mat.shape[1]} features to {args.output}")


def combine_features(args):
    a, b = BigFile(args.a), BigFile(args.b)
    shared = [n for n in a.names if n in b]
    mat = np.concatenate([a.read_batch(shared), b.read_batch(shared)], axis=1)
    write_bigfile(args.output, shared, mat)
    print(f"combined {len(shared)} ids -> {mat.shape[1]} dims at {args.output}")


def format_check(args):
    ok = True
    caps = captions_from_txt(args.captions)
    seen = set()
    for cap_id, cap in caps:
        if "#" not in cap_id:
            print(f"BAD cap id (no #): {cap_id}")
            ok = False
        if cap_id in seen:
            print(f"DUPLICATE cap id: {cap_id}")
            ok = False
        seen.add(cap_id)
        if not cap.strip():
            print(f"EMPTY caption: {cap_id}")
            ok = False
    if args.features:
        bf = BigFile(args.features)
        vids = {c.split("#", 1)[0] for c, _ in caps}
        if args.video2frames:
            from ..data.provider import read_video2frames
            v2f = read_video2frames(args.video2frames)
            for v in sorted(vids):
                if v not in v2f:
                    print(f"MISSING video2frames entry: {v}")
                    ok = False
                    continue
                for fid in v2f[v]:
                    if fid not in bf:
                        print(f"MISSING feature row: {fid}")
                        ok = False
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


def build_vocab_cmd(args):
    caps = [c for _, c in captions_from_txt(args.captions)]
    for style in ("rnn", "bow"):
        vocab, counter = build_vocab(caps, style, args.threshold)
        d = os.path.join(args.output, style)
        os.makedirs(d, exist_ok=True)
        vocab.save(os.path.join(d, f"word_vocab_{args.threshold}.json"))
        print(f"{style}: {len(vocab)} words")


def build_tags_cmd(args):
    caps = captions_from_txt(args.captions)
    per_video = {}
    for cap_id, cap in caps:
        per_video.setdefault(cap_id.split("#", 1)[0], []).append(cap)
    vocab = build_tag_vocab([c for cl in per_video.values() for c in cl],
                            args.vocab_size)
    scores = video_tag_scores(per_video, vocab)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    write_tag_file(args.output, scores)
    with open(args.output + ".vocab.json", "w") as f:
        json.dump(vocab, f)
    print(f"wrote tags for {len(scores)} videos, vocab {len(vocab)}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("txt2bin")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=txt2bin)

    p = sub.add_parser("combine_features")
    p.add_argument("--a", required=True)
    p.add_argument("--b", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=combine_features)

    p = sub.add_parser("format_check")
    p.add_argument("--captions", required=True)
    p.add_argument("--features", default=None)
    p.add_argument("--video2frames", default=None)
    p.set_defaults(fn=format_check)

    p = sub.add_parser("build_vocab")
    p.add_argument("--captions", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=int, default=5)
    p.set_defaults(fn=build_vocab_cmd)

    p = sub.add_parser("build_tags")
    p.add_argument("--captions", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--vocab_size", type=int, default=512)
    p.set_defaults(fn=build_tags_cmd)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main() or 0)
