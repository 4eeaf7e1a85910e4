"""Provenance guard (VERDICT round-1, missing item 7).

The survey and all framework-defined formats (ari/RLE/DC/BWT framing) were
pinned while /root/reference was EMPTY.  If the mount ever populates, this
test fails loudly so the session re-pins formats against the real tree
(SURVEY.md provenance note) instead of silently shipping guesses.
"""

import os


def test_reference_mount_still_empty():
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return  # no mount at all — nothing to re-verify
    entries = os.listdir(ref)
    assert not entries, (
        "/root/reference is NO LONGER EMPTY — the upstream source has "
        "appeared.  STOP and re-pin formats: diff SURVEY.md against the "
        f"real tree (found {entries[:10]}...) before trusting the "
        "framework-defined ari/RLE/DC/BWT stream formats."
    )
