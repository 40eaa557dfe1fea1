"""Column-expression building blocks (all JVM-side, Catalyst-optimizable)."""
