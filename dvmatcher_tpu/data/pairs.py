"""Dataset-specific pair lists.

The reference hard-codes ordered-pair lists per benchmark inside its
dataset classes; collected here as one registry:
  * TOSCA: per-class permutations (models/dataset.py:407-418)
  * SHREC'16 cuts/holes: template->crop train/test lists
    (models/dataset_partial.py:121-160)
  * SHREC'16 cuts/holes test sets: per-class template-to-all
    (models/dataset_partial.py:359-382)
  * partial default: template-to-all (0, i) (models/dataset_partial.py:384-386)
"""

from __future__ import annotations

from itertools import permutations


def tosca_pairs() -> list[tuple[int, int]]:
    cat = list(permutations(range(11), 2))
    centaur = list(permutations(range(11, 17), 2))
    dog = list(permutations(range(17, 26), 2))
    gorilla = list(permutations(range(26, 30), 2))
    horse = list(permutations(range(30, 38), 2))
    wolf = list(permutations(range(38, 41), 2))
    return cat + centaur + dog + gorilla + horse + wolf


def shrec16_cuts_pairs(split: str) -> list[tuple[int, int]]:
    if split == "train":
        tpl = [
            (0, range(2, 15)), (1, range(17, 30)), (122, range(32, 45)),
            (123, range(47, 60)), (124, range(62, 75)), (125, range(77, 90)),
            (126, range(92, 105)),
        ]
        pairs = [(a, i) for a, r in tpl for i in r]
        # the reference's odd entry (dataset_partial.py:124: "(0,19)")
        pairs[pairs.index((1, 19))] = (0, 19)
        return pairs
    return [
        (0, 15), (0, 16), (1, 30), (1, 31), (122, 45), (122, 46),
        (123, 60), (123, 61), (124, 75), (124, 76), (125, 90), (125, 91),
        (126, 105), (126, 106),
    ]


def shrec16_holes_pairs(split: str) -> list[tuple[int, int]]:
    if split == "train":
        tpl = [
            (0, range(4, 13)), (1, range(14, 23)), (2, range(24, 33)),
            (3, range(34, 43)), (83, range(44, 53)), (84, range(54, 63)),
            (85, range(64, 73)),
        ]
        pairs = [(a, i) for a, r in tpl for i in r]
        if (1, 16) in pairs:  # reference's (0,16) oddity
            pairs[pairs.index((1, 16))] = (0, 16)
        return pairs
    return [(0, 13), (1, 23), (2, 33), (3, 43), (83, 53), (84, 63), (85, 73)]


def shrec16_cuts_test_pairs() -> list[tuple[int, int]]:
    groups = [
        (0, range(2, 32)), (1, range(32, 44)), (202, range(44, 64)),
        (203, range(64, 84)), (204, range(84, 104)), (205, range(104, 163)),
        (206, range(163, 195)), (207, range(195, 202)),
    ]
    return [(a, i) for a, r in groups for i in r]


def shrec16_holes_test_pairs() -> list[tuple[int, int]]:
    groups = [
        (0, range(4, 29)), (1, range(29, 46)), (2, range(46, 66)),
        (3, range(66, 92)), (204, range(92, 113)), (205, range(113, 167)),
        (206, range(167, 194)), (207, range(194, 204)),
    ]
    return [(a, i) for a, r in groups for i in r]


def template_to_all(n: int) -> list[tuple[int, int]]:
    return [(0, i) for i in range(n)]


_AMASS_ANIMALS = ("cat", "centaur", "dog", "gorilla", "horse")


def amass_ssft_pairs(shape_names: list[str]) -> list[tuple[int, int]]:
    """Animal-vs-human split pairs (models/dataset.py:121-127): ordered
    pairs within the animal subset plus within the non-animal subset."""
    animal = [i for i, n in enumerate(shape_names) if any(a in n for a in _AMASS_ANIMALS)]
    human = [i for i, n in enumerate(shape_names) if not any(a in n for a in _AMASS_ANIMALS)]
    return list(permutations(animal, 2)) + list(permutations(human, 2))


REGISTRY = {
    "tosca": lambda split, n: tosca_pairs(),
    "shrec16_cuts": lambda split, n: shrec16_cuts_pairs(split),
    "shrec16_holes": lambda split, n: shrec16_holes_pairs(split),
    "shrec16_cuts_test": lambda split, n: shrec16_cuts_test_pairs(),
    "shrec16_holes_test": lambda split, n: shrec16_holes_test_pairs(),
}


def pairs_for(
    name: str,
    split: str,
    n_shapes: int,
    shape_names: list[str] | None = None,
) -> list[tuple[int, int]] | None:
    """Registry lookup; None -> caller uses the default (all permutations /
    template-to-all)."""
    if name == "amass_ssft" and shape_names is not None:
        return amass_ssft_pairs(shape_names)
    fn = REGISTRY.get(name)
    return fn(split, n_shapes) if fn else None
