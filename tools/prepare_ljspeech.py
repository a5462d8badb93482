#!/usr/bin/env python
"""LJSpeech fine-tuning recipe: raw corpus -> train/valid datalist.jsonl.

Counterpart of reference `data/LJspeech/src/step{1,2}*.py`:
  - resample wavs to 16 kHz (scipy polyphase instead of librosa)
  - English G2P with the trailing '.'/'?' mark kept
    (reference step2_get_phoneme.py:75-78)
  - prompt initialized to the original text (step2:41)
  - train/valid split: last 3 utterances held out (step2:116-123)

Usage:
  python tools/prepare_ljspeech.py --corpus /path/LJSpeech-1.1 \
      --output data/ljspeech [--lexicon librispeech-lexicon.txt]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def resample_to_16k(src_path: str, dst_path: str):
    from emotivoice_tpu.utils.audio_io import read_wav, resample, write_wav

    sr, wav = read_wav(src_path)
    wav = resample(wav, sr, 16000)
    write_wav(dst_path, np.clip(wav, -1.0, 1.0), 16000)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="LJSpeech-1.1 root")
    p.add_argument("--output", required=True)
    p.add_argument("--lexicon", default=None)
    p.add_argument("--speaker", default="0001", help="new voice speaker id")
    p.add_argument("--valid-n", type=int, default=3)
    args = p.parse_args()

    from emotivoice_tpu.frontend.en import get_eng_phoneme, read_lexicon

    lexicon = read_lexicon(args.lexicon) if args.lexicon else None

    meta = os.path.join(args.corpus, "metadata.csv")
    wav_dir = os.path.join(args.output, "wavs_16k")
    os.makedirs(wav_dir, exist_ok=True)

    records = []
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 3:
                continue
            key, _, text = parts[0], parts[1], parts[2]
            src = os.path.join(args.corpus, "wavs", f"{key}.wav")
            if not os.path.exists(src):
                continue
            dst = os.path.join(wav_dir, f"{key}.wav")
            if not os.path.exists(dst):
                resample_to_16k(src, dst)
            # Keep the sentence-final mark (reference step2:75-78).
            mark = "?" if text.rstrip().endswith("?") else "."
            phonemes = get_eng_phoneme(text, lexicon, pad_sos_eos=False).split()
            phonemes = ["<sos/eos>"] + phonemes + [mark, "<sos/eos>"]
            records.append(
                {
                    "key": key,
                    "wav_path": os.path.abspath(dst),
                    "speaker": args.speaker,
                    "text": phonemes,
                    "original_text": text,
                    "prompt": text,  # reference initializes prompt to text
                }
            )

    os.makedirs(os.path.join(args.output, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.output, "valid"), exist_ok=True)
    train, valid = records[: -args.valid_n], records[-args.valid_n :]
    for name, recs in [("train", train), ("valid", valid)]:
        path = os.path.join(args.output, name, "datalist.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for r in recs:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        print(f"wrote {path} ({len(recs)} utterances)")


if __name__ == "__main__":
    main()
