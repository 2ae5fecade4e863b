// Stub replacement for the reference's textures/ptex.cpp (the Ptex submodule
// is absent in this mount).  Scenes that request "ptex" textures error out;
// none of the golden scenes use ptex.
#include "textures/ptex.h"

#include "error.h"
#include "interaction.h"
#include "paramset.h"

namespace pbrt {

template <typename T>
PtexTexture<T>::PtexTexture(const std::string &filename, Float gamma)
    : valid(false), filename(filename), gamma(gamma) {
    Error("ptex support is not compiled into this golden-reference build");
}

template <typename T>
PtexTexture<T>::~PtexTexture() {}

template <typename T>
T PtexTexture<T>::Evaluate(const SurfaceInteraction &) const {
    return T(0.f);
}

template class PtexTexture<Float>;
template class PtexTexture<Spectrum>;

PtexTexture<Float> *CreatePtexFloatTexture(const Transform &,
                                           const TextureParams &tp) {
    std::string filename = tp.FindFilename("filename");
    Float gamma = tp.FindFloat("gamma", 2.2f);
    return new PtexTexture<Float>(filename, gamma);
}

PtexTexture<Spectrum> *CreatePtexSpectrumTexture(const Transform &,
                                                 const TextureParams &tp) {
    std::string filename = tp.FindFilename("filename");
    Float gamma = tp.FindFloat("gamma", 2.2f);
    return new PtexTexture<Spectrum>(filename, gamma);
}

}  // namespace pbrt
