"""Reusable column-expression helpers — pure, JVM-side, codegen-friendly."""
