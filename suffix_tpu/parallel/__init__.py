"""Multi-device sharded construction and collectives."""
