"""Pair-list registry tests (reference hard-coded lists parity)."""

from dvmatcher_tpu.data.pairs import (
    pairs_for,
    shrec16_cuts_pairs,
    shrec16_holes_pairs,
    shrec16_cuts_test_pairs,
    tosca_pairs,
)


def test_tosca_pairs():
    pairs = tosca_pairs()
    assert len(pairs) == 11 * 10 + 6 * 5 + 9 * 8 + 4 * 3 + 8 * 7 + 3 * 2
    assert (0, 10) in pairs and (10, 0) in pairs
    assert (10, 11) not in pairs  # cross-class excluded


def test_shrec16_cuts_train_oddity():
    pairs = shrec16_cuts_pairs("train")
    assert (0, 19) in pairs and (1, 19) not in pairs
    assert len(pairs) == 7 * 13
    assert pairs_for("shrec16_cuts", "train", 0) == pairs


def test_shrec16_holes_train_oddity():
    pairs = shrec16_holes_pairs("train")
    assert (0, 16) in pairs and (1, 16) not in pairs
    assert len(pairs) == 7 * 9


def test_shrec16_test_lists():
    assert len(shrec16_cuts_pairs("test")) == 14
    assert len(shrec16_holes_pairs("test")) == 7
    cuts = shrec16_cuts_test_pairs()
    assert cuts[0] == (0, 2) and (207, 201) in cuts


def test_unknown_returns_none():
    assert pairs_for("scape_r", "train", 5) is None


def test_amass_ssft_pairs():
    from dvmatcher_tpu.data.pairs import pairs_for

    names = ["cat0", "cat1", "human0", "human1", "human2"]
    pairs = pairs_for("amass_ssft", "train", len(names), names)
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (2, 3) in pairs and (4, 2) in pairs
    assert (0, 2) not in pairs  # no cross animal-human pairs
    assert len(pairs) == 2 + 6
