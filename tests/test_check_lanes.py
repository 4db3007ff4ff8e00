"""The scale-ladder lane presets in tools/check.py must cover the whole
catalog: a new registry entry that matches no lane would silently escape the
sf1/sf10 sweep cadence, so the union of lanes is asserted to equal the
registry exactly (and ``misc`` to stay empty — every entry belongs to a
deliberate lane, not a catch-all)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import __spark_entry__ as entrymod
from check import LANES, lane_members, resolve_sf


def test_lanes_cover_registry_exactly():
    names = list(entrymod.queries())
    lanes = lane_members(names)
    flat = [n for members in lanes.values() for n in members]
    assert sorted(flat) == sorted(names)  # partition: no loss, no dupes
    assert lanes["misc"] == [], f"entries outside every lane: {lanes['misc']}"
    for lane in LANES:
        assert lanes[lane], f"lane {lane!r} is empty — stale preset?"


def test_resolve_sf_shorthands():
    assert resolve_sf("sf0.01") == "/root/testdata/sf0.01"
    assert resolve_sf("/root/testdata/sf0.01") == "/root/testdata/sf0.01"
