"""Native C++ runtime components (parsers, aligner, POA oracle)."""
