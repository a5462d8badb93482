#!/usr/bin/env python
"""MFA (Montreal Forced Aligner) integration: export a corpus for MFA and
import its TextGrid alignments back into a training datalist.

Counterpart of the reference's `mfa/step{1-9}*.py` shell-sequenced pipeline,
consolidated into two subcommands (MFA itself is an external tool the
operator runs in between, as in the reference README):

  export   datalist.jsonl -> MFA corpus dir (.lab + wav symlinks grouped by
           speaker, reference step5_prepare_alignment.py:33-79) +
           pronunciation dictionary (underscore-joined word pronunciations,
           step5:72-75) + special-token list (step3_prepare_special_tokens.py)

  import   TextGrid dir -> datalist_mfa.jsonl with per-phoneme durations:
           TextGrid parsing with MFA1.x/2.x silence conventions
           (step7_gen_alignment_from_textgrid.py `readtg` lines 33-60),
           special-token re-insertion into the aligned sequence (step7
           `insert_special_tokens` lines 63-123), optional silence-token
           reassignment by duration thresholds (step7 lines 209-238),
           bracket/boundary-token restoration + prompt merge + last-3
           valid split (step9_datalist_from_mfa.py)

Durations are exported in seconds (2-decimal, step7:243) — the dataset
converts to frames at load time.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPECIAL_TOKENS = {
    "sp0", "sp1", "sp2", "sp3", "sp4",
    "engsp1", "engsp2", "engsp3", "engsp4",
    "<sos/eos>", "cn_eng_sp", "eng_cn_sp", ".", "?", "LAUGH",
    # underscore-free aliases used inside MFA labels (step1:27-30)
    "cnengsp", "engcnsp",
}
SILENCE_TOKENS = {"sp", "sil"}


def mfa_phones(text):
    """Datalist phonemes -> MFA label tokens: strip [] brackets, join
    boundary tokens (reference step1_create_dataset.py:23-31)."""
    out = []
    for ph in text:
        if ph.startswith("["):
            ph = ph[1:-1]
        elif ph == "cn_eng_sp":
            ph = "cnengsp"
        elif ph == "eng_cn_sp":
            ph = "engcnsp"
        out.append(ph)
    return out


def read_datalist(path):
    with open(path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def cmd_export(args):
    data = read_datalist(args.datalist)
    # dedup by key_speaker (reference step1:21)
    data = list({f'{s["key"]}_{s["speaker"]}': s for s in data}.values())

    corpus = os.path.abspath(args.corpus_dir)
    pron_dict = set()
    n = 0
    for s in data:
        speaker = re.sub(r" +", "", s["speaker"])
        spk_dir = os.path.join(corpus, speaker)
        os.makedirs(spk_dir, exist_ok=True)
        phones = mfa_phones(s["text"])
        # group consecutive non-special phones into underscore-joined words
        # (reference step4_convert_text_to_phn.py:38-50)
        words, word = [], []
        for ph in phones:
            if ph in SPECIAL_TOKENS:
                if word:
                    words.append("_".join(word))
                    word = []
            else:
                word.append(ph)
        if word:
            words.append("_".join(word))
        pron_dict |= set(words)

        stem = f"{speaker}_{s['key']}"
        wav_link = os.path.join(spk_dir, f"{stem}.wav")
        if not os.path.exists(s["wav_path"]):
            print(f"missing wav: {s['wav_path']}")
            continue
        if not os.path.lexists(wav_link):
            os.symlink(os.path.abspath(s["wav_path"]), wav_link)
        with open(os.path.join(spk_dir, f"{stem}.lab"), "w",
                  encoding="utf-8") as f:
            f.write(" ".join(words))
        n += 1

    with open(args.dict, "w", encoding="utf-8") as f:
        for word in sorted(pron_dict):
            if word:
                f.write(f"{word} {' '.join(word.split('_'))}\n")
    print(f"exported {n} utterances to {corpus}; "
          f"{len(pron_dict)} dictionary entries -> {args.dict}")
    print("next: mfa train (or align) "
          f"{corpus} {args.dict} <model> <textgrid_dir>")


# ---------------------------------------------------------------------------
# TextGrid parsing (self-contained; replaces praatio)
# ---------------------------------------------------------------------------

def parse_textgrid_phones(path):
    """Return (labels, end_times) of the 'phones' tier, empty labels kept.

    Handles the standard long TextGrid format MFA emits.
    """
    with open(path, encoding="utf-8") as f:
        content = f.read()
    # split into item blocks; find the one whose name is "phones"
    items = re.split(r'item\s*\[\d+\]:', content)
    tier = None
    for block in items[1:]:
        m = re.search(r'name\s*=\s*"([^"]*)"', block)
        if m and m.group(1) == "phones":
            tier = block
            break
    if tier is None:
        raise ValueError(f"no 'phones' tier in {path}")
    labels, ends = [], []
    for m in re.finditer(
        r'intervals\s*\[\d+\]:\s*'
        r'xmin\s*=\s*([\d.eE+-]+)\s*'
        r'xmax\s*=\s*([\d.eE+-]+)\s*'
        r'text\s*=\s*"([^"]*)"',
        tier,
    ):
        ends.append(float(m.group(2)))
        labels.append(m.group(3).strip())
    if not labels:
        raise ValueError(f"no intervals parsed from {path}")
    return labels, ends


def readtg(path):
    """TextGrid -> (phones, durations) with the reference's MFA1.x/2.x
    silence-label normalization (step7 `readtg`)."""
    phones, ends = parse_textgrid_phones(path)
    durations = []
    prev = 0.0
    for e in ends:
        durations.append(e - prev)
        prev = e
    # merge trailing "" into a preceding "sp"
    if phones[-1] == "" and len(phones) > 1 and phones[-2] == "sp":
        phones = phones[:-1]
        durations[-2] += durations[-1]
        durations = durations[:-1]
    if phones[-1] == "sp":  # MFA1.x trailing sp
        phones[-1] = "sil"
    out = []
    for i, ph in enumerate(phones):
        if ph == "":
            out.append("sil" if i in (0, len(phones) - 1) else "sp")
        else:
            out.append(ph)
    return out, durations


def insert_special_tokens(with_special, aligned, durations):
    """Merge MFA durations back onto the special-token-bearing sequence.

    `with_special` is the flattened datalist phoneme sequence (brackets
    stripped, boundary tokens underscore-free); `aligned` is the MFA tier
    with silence phones. Silence durations accrue to the preceding special
    token (reference step7 `insert_special_tokens`).
    """
    new_seq, new_dur = [], []
    i = j = 0
    while i < len(with_special) and j < len(aligned):
        if with_special[i] == aligned[j]:
            new_seq.append(with_special[i])
            new_dur.append(durations[j])
            i += 1
            j += 1
        elif with_special[i] in SPECIAL_TOKENS:
            new_seq.append(with_special[i])
            new_dur.append(0.0)
            i += 1
        elif aligned[j] in SILENCE_TOKENS:
            if not new_seq or new_seq[-1] not in SPECIAL_TOKENS:
                raise ValueError(
                    f"silence at {j} not preceded by special token"
                )
            new_dur[-1] += durations[j]
            j += 1
        else:
            raise ValueError(
                f"inconsistent sequences at {i}/{j}: "
                f"{with_special[i]!r} vs {aligned[j]!r}"
            )
    while i < len(with_special):
        new_seq.append(with_special[i])
        new_dur.append(0.0)
        i += 1
    while j < len(aligned):
        if new_seq[-1] not in SPECIAL_TOKENS:
            raise ValueError("trailing silence without special token")
        new_dur[-1] += durations[j]
        j += 1
    return new_seq, new_dur


def reassign_silences(seq, dur):
    """Re-grade silence tokens by their measured duration
    (reference step7 lines 209-238)."""
    out = []
    for ph, d in zip(seq, dur):
        if ph in {"engsp1", "engsp2", "engsp4"}:
            out.append("engsp1" if d < 0.1 else
                       "engsp2" if d < 0.3 else "engsp4")
        elif ph in {"sp0", "sp1", "sp2", "sp3", "sp4"}:
            if d == 0.0:
                out.append(ph if ph in {"sp0", "sp1"} else "sp0")
            elif d < 0.03:
                out.append("sp0")
            elif d < 0.1:
                out.append("sp1")
            elif d < 0.3:
                out.append("sp2")
            else:
                out.append("sp3")
        else:
            out.append(ph)
    return out


def restore_datalist_phones(seq):
    """MFA tokens back to datalist form: re-bracket uppercase ARPAbet,
    restore boundary tokens (reference step9:24-31)."""
    out = []
    for ph in seq:
        if ph.isupper() and ph != "LAUGH":
            ph = f"[{ph}]"
        elif ph == "cnengsp":
            ph = "cn_eng_sp"
        elif ph == "engcnsp":
            ph = "eng_cn_sp"
        out.append(ph)
    return out


def cmd_import(args):
    data = read_datalist(args.datalist)
    tgs = {}
    for subdir, _dirs, files in os.walk(args.textgrid_dir):
        for fn in files:
            if fn.endswith(".TextGrid"):
                tgs[fn[: -len(".TextGrid")]] = os.path.join(subdir, fn)

    out = []
    n_miss = n_fail = 0
    for s in data:
        speaker = re.sub(r" +", "", s["speaker"])
        tg_path = tgs.get(f"{speaker}_{s['key']}")
        if tg_path is None:
            n_miss += 1
            continue
        try:
            tg_phones, tg_dur = readtg(tg_path)
            # flatten datalist phones to MFA granularity: strip brackets,
            # split underscore words are already split (each datalist entry
            # is one phone), just map boundary tokens
            flat = []
            for ph in s["text"]:
                if ph in {"cn_eng_sp", "eng_cn_sp"}:
                    flat.append("".join(ph.split("_")))
                else:
                    flat.extend(
                        (ph[1:-1] if ph.startswith("[") else ph).split("_")
                    )
            seq, dur = insert_special_tokens(flat, tg_phones, tg_dur)
        except (ValueError, AssertionError) as e:
            print(f"skip {s['key']}: {e}")
            n_fail += 1
            continue
        if args.reassign_sp:
            seq = reassign_silences(seq, dur)
        rec = dict(s)
        rec["text"] = restore_datalist_phones(seq)
        rec["duration"] = [round(d, 2) for d in dur]
        out.append(rec)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".",
                exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as f:
        for rec in out:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    if args.valid_output and len(out) > 3:  # last-3 split (step9:104-110)
        with open(args.valid_output, "w", encoding="utf-8") as f:
            for rec in out[-3:]:
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"imported {len(out)} aligned utterances -> {args.output} "
          f"({n_miss} missing TextGrids, {n_fail} inconsistent)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="datalist -> MFA corpus + dict")
    pe.add_argument("--datalist", required=True)
    pe.add_argument("--corpus-dir", required=True)
    pe.add_argument("--dict", required=True,
                    help="output pronunciation dictionary path")
    pe.set_defaults(fn=cmd_export)

    pi = sub.add_parser("import", help="TextGrids -> datalist with durations")
    pi.add_argument("--datalist", required=True)
    pi.add_argument("--textgrid-dir", required=True)
    pi.add_argument("--output", required=True)
    pi.add_argument("--valid-output", default=None)
    pi.add_argument("--reassign-sp", action="store_true")
    pi.set_defaults(fn=cmd_import)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
