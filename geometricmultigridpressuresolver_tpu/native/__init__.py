"""Native (C++) runtime pieces; sources compiled on first use by io.py."""
