"""CLI-contract defaults resolve in a fresh clone (VERDICT r4 item 5).

The reference ships its ImageNet-100 split lists in-repo
(reference dataset/ImageNet-100-effb0_{train,val}_cls_ratio0.8.txt,
consumed by dataset/dataset.py:22-29); train_search.py's defaults point at
the same relative paths, so the files must exist here too."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _default_of(flag):
    src = open(os.path.join(REPO, "train_search.py")).read()
    m = re.search(flag + r"'[^)]*?default=\"(\./[^\"]+)\"", src, re.S)
    assert m, f"no default found for {flag}"
    return m.group(1)


def test_imagenet100_list_defaults_exist():
    for flag in ("--train_list", "--val_list"):
        rel = _default_of(flag)
        path = os.path.join(REPO, rel)
        assert os.path.isfile(path), f"{flag} default {rel} missing"
        with open(path) as f:
            first = f.readline().split()
        assert len(first) == 2 and first[1].isdigit()  # "path label" format
