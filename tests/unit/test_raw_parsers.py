"""Raw-file parsers against miniature synthetic fixtures in each format.

No real dataset files exist in this environment (no egress); these fixtures
are hand-authored in the exact on-disk formats the parsers target, so the
parse → vocab → split path is covered end-to-end.
"""

import numpy as np
import pytest

from seqrec_tpu.data.dataset import (
    _parse_amazon_csv,
    _parse_ml100k,
    _parse_ml1m,
    _parse_rsc15,
    _parse_steam,
    prepare_dataset,
)


def test_ml100k_format(tmp_path):
    p = tmp_path / "u.data"
    # user \t item \t rating \t ts
    p.write_text(
        "1\t10\t5\t100\n"
        "1\t20\t4\t200\n"
        "1\t30\t3\t50\n"   # earliest for user 1
        "2\t10\t2\t10\n"
        "2\t20\t1\t20\n"
    )
    ds = _parse_ml100k(str(p))
    assert ds.num_users == 2
    assert ds.vocab_size == 4
    # User 1 chronological: 30(ts50), 10(100), 20(200).
    # Frequency order: 10 and 20 appear 2x (ids 1,2 by first-seen), 30 1x (3).
    np.testing.assert_array_equal(ds.seq(0), [3, 1, 2])


def test_ml1m_format(tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text(
        "1::101::5::978300760\n"
        "1::102::3::978302109\n"
        "2::101::4::978301968\n"
        "2::103::4::978300275\n"
        "junk line\n"
    )
    ds = _parse_ml1m(str(p))
    assert ds.num_users == 2
    assert ds.vocab_size == 4
    # User 2: 103 (earlier ts) then 101.
    s = ds.seq(1)
    assert len(s) == 2


def test_amazon_csv_format(tmp_path):
    p = tmp_path / "ratings_Beauty.csv"
    rows = []
    # 5-core: 2 users x 5 shared items -> everything survives.
    for u in ("A1", "A2", "A3", "A4", "A5"):
        for i, item in enumerate(("B1", "B2", "B3", "B4", "B5")):
            rows.append(f"{u},{item},5.0,{1000 + i}\n")
    p.write_text("".join(rows))
    ds = _parse_amazon_csv(str(p), "beauty")
    assert ds.num_users == 5
    assert ds.vocab_size == 6
    assert all(len(ds.seq(u)) == 5 for u in range(5))


def test_steam_format(tmp_path):
    p = tmp_path / "steam_reviews.json"
    rows = []
    for u in ("u1", "u2", "u3", "u4", "u5"):
        for i, g in enumerate(("g1", "g2", "g3", "g4", "g5")):
            rows.append(
                "{'username': %r, 'product_id': %r, 'date': '2015-01-%02d'}\n"
                % (u, g, i + 1)
            )
    rows.append("not a dict\n")
    p.write_text("".join(rows))
    ds = _parse_steam(str(p))
    assert ds.num_users == 5
    assert ds.vocab_size == 6


def test_rsc15_format(tmp_path):
    p = tmp_path / "yoochoose-clicks.dat"
    rows = []
    # Item 900 is clicked < 5 times -> filtered; session 3 then shrinks to
    # length 1 -> dropped. Items 100/200 survive (5+ clicks each).
    for s in (1, 2, 3, 4, 5):
        rows.append(f"{s},2014-04-07T10:5{s}:09.277Z,100,0\n")
        rows.append(f"{s},2014-04-07T11:5{s}:09.277Z,200,0\n")
    rows.append("3,2014-04-07T09:00:00.000Z,900,0\n")
    rows.append("6,2014-04-07T09:00:00.000Z,900,0\n")  # session len 1 anyway
    p.write_text("".join(rows))
    ds = _parse_rsc15(str(p))
    assert ds.num_users == 5  # 5 surviving sessions
    assert ds.vocab_size == 3  # items 100, 200 (+pad)
    # ISO timestamps order chronologically within each session.
    assert all(len(ds.seq(u)) == 2 for u in range(5))


def test_prepare_dataset_finds_raw_in_subdir(tmp_path):
    raw = tmp_path / "ml-100k"
    raw.mkdir()
    (raw / "u.data").write_text("1\t10\t5\t100\n1\t20\t4\t200\n")
    ds = prepare_dataset("ml-100k", str(tmp_path))
    assert ds.num_users == 1
    # Canonical output persisted next to the raw file.
    assert (raw / "seqs.npz").exists()
    assert (raw / "vocab.json").exists()


def test_prepare_dataset_missing_raw(tmp_path):
    with pytest.raises(FileNotFoundError, match="no network egress"):
        prepare_dataset("steam", str(tmp_path))
