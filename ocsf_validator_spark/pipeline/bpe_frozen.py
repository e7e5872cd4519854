"""Frozen BPE merges: bpe_learn(n_merges=16) over the
sf0.01 documents table (integer pair counts, lexicographic
tie break -> deterministic at any parallelism). Regenerate:
python tools/freeze_bpe.py"""

BPE_MERGES = [
    ('e', 'r'),
    ('e', '_'),
    ('n', '_'),
    ('er', '_'),
    ('o', 'w'),
    ('ow', '_'),
    ('o', 'r'),
    ('s', 't'),
    ('h', '_'),
    ('a', 't'),
    ('l', 'u'),
    ('i', 'n'),
    ('a', '_'),
    ('g', '_'),
    ('y', '_'),
    ('a', 'r'),
]
