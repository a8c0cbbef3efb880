/* Minimal stand-in for bwa's bwt.h — nothing from it is used by the
 * reference align core compiled for the replay oracle. */
#ifndef EMA_STUB_BWT_H
#define EMA_STUB_BWT_H
#endif
