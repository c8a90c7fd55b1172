"""Core primitives: MT19937 bit stream, rANS state machine, bit plumbing."""
