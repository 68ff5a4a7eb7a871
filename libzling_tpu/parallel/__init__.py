"""Multi-device / multi-host scale-out for the zling codec."""
