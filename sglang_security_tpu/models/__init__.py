"""Model zoo: functional decoder implementations + HF architecture registry."""
