#!/usr/bin/env python
"""DataBaker (BZNSYP) Chinese fine-tuning recipe: raw corpus -> datalists.

Counterpart of reference `data/DataBaker/src/step{1,2}*.py`:
  - parse `ProsodyLabeling/000001-010000.txt` label pairs: text line with
    `#N` prosody marks + pinyin line (reference step1:27-74)
  - erhua (儿化音) handling: drop 儿 chars whose syllable is fused into the
    previous one (step1:57-64), plus the reference's two hard-coded corpus
    fixes (005107 `ng1`->`en1`, skip 002365; step1:46-49)
  - resample wavs to 16 kHz (scipy polyphase instead of librosa)
  - `#0..#4` -> `sp0..sp4`, corpus pinyin split into initial/final phones
    via the same splitter the frontend uses (step2 `get_phoneme`)
  - `prompt` initialized to the original text (step2 `onetime`)
  - train/valid split: last 3 utterances held out (matching LJSpeech recipe)

Usage:
  python tools/prepare_databaker.py --corpus /path/BZNSYP --output data/databaker
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROSODY = {"#0": "sp0", "#1": "sp1", "#2": "sp2", "#3": "sp3", "#4": "sp4"}
PUNCT_RE = re.compile("[。，、“”？：……！（ ）—；]")


def parse_label_pair(text_line, pinyin_line):
    """One (text, pinyin) label pair -> token sequence of hanzi-syllables and
    prosody marks, with erhua fusion."""
    content = PUNCT_RE.sub("", text_line)
    chars, prosody = [], {}
    j = 0
    while j < len(content):
        if content[j] == "#":
            prosody[len(chars) - 1] = content[j : j + 2]
            j += 2
        else:
            chars.append(content[j])
            j += 1

    syllables = pinyin_line.split()
    s_index = 0
    tokens = []  # pinyin syllables and #N marks
    for k, ch in enumerate(chars):
        er_flag = False
        if ch == "儿" and (
            s_index == len(syllables) or not syllables[s_index].startswith("er")
        ):
            er_flag = True  # erhua fused into previous syllable
        else:
            tokens.append(syllables[s_index])
            s_index += 1
        if k in prosody:
            if er_flag:
                tokens[-1] = prosody[k]
            else:
                tokens.append(prosody[k])
        else:
            tokens.append("#0")
    return tokens


def tokens_to_phonemes(tokens):
    from emotivoice_tpu.frontend.cn import split_pinyin

    phones = []
    for t in tokens:
        if t in PROSODY:
            phones.append(PROSODY[t])
        else:
            phones.extend(p for p in split_pinyin(t) if p)
    return phones


def resample_to_16k(src_path, dst_path):
    import numpy as np

    from emotivoice_tpu.utils.audio_io import read_wav, resample, write_wav

    sr, wav = read_wav(src_path)
    wav = resample(wav, sr, 16000)
    write_wav(dst_path, np.clip(wav, -1.0, 1.0), 16000)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="BZNSYP root dir")
    p.add_argument("--output", required=True)
    p.add_argument("--skip-audio", action="store_true",
                   help="labels only (no wav resampling)")
    args = p.parse_args()

    label_path = os.path.join(
        args.corpus, "ProsodyLabeling", "000001-010000.txt"
    )
    wav_dir = os.path.join(args.output, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    for sub in ("train", "valid"):
        os.makedirs(os.path.join(args.output, sub), exist_ok=True)

    records = []
    with open(label_path, encoding="utf-8") as f:
        lines = f.readlines()
    for i in range(0, len(lines) - 1, 2):
        key = lines[i][:6]
        original_text = re.sub(r"#\d", "", lines[i][7:].strip())
        pinyin_line = lines[i + 1].strip()
        if key == "002365":  # corrupt corpus entry (reference step1:49)
            continue
        if key == "005107":
            pinyin_line = pinyin_line.replace(" ng1", " en1")
        try:
            tokens = parse_label_pair(lines[i][7:].strip(), pinyin_line)
            phones = tokens_to_phonemes(tokens)
        except (IndexError, KeyError) as e:
            print(f"skip {key}: {e}")
            continue
        # trailing prosody mark dropped, wrapped in <sos/eos> (step1:86)
        text = ["<sos/eos>"] + phones[:-1] + ["<sos/eos>"]

        src_wav = os.path.join(args.corpus, "Wave", f"{key}.wav")
        dst_wav = os.path.join(wav_dir, f"{key}.wav")
        if not args.skip_audio:
            if not os.path.exists(src_wav):
                print(f"missing wav {src_wav}")
                continue
            if not os.path.exists(dst_wav):
                resample_to_16k(src_wav, dst_wav)

        records.append({
            "key": key,
            "wav_path": os.path.abspath(dst_wav),
            "speaker": "BZNSYP",
            "text": text,
            "original_text": original_text,
            "prompt": original_text,
        })

    def dump(path, recs):
        with open(path, "w", encoding="utf-8") as f:
            for r in recs:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")

    dump(os.path.join(args.output, "train", "datalist.jsonl"), records[:-3])
    dump(os.path.join(args.output, "valid", "datalist.jsonl"), records[-3:])
    print(f"{len(records)} utterances -> {args.output} "
          f"(train {len(records) - 3} / valid 3)")


if __name__ == "__main__":
    main()
