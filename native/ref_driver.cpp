// Independent-validation driver for the UPSTREAM reference denoiser core.
//
// This file is OUR code: a ~100-line raw-array harness that links against
// the reference's own src/core/*.cpp (built out-of-tree from
// /root/reference by scripts/independent_check.py — never copied into this
// repo). It exists so parity claims do not all chain through
// tests/reference_impl.py (same author as the engine): here the oracle is
// the reference's actual compiled C++ (Denoiser.cpp / DenoisingUnit.cpp /
// MultiscaleDenoiser.cpp), CPU path, no CUDA.
//
// Protocol (all little-endian on the only platform we run on):
//   argv: in.bin out.bin
//   in.bin:  int32[8]  = w, h, nbOfBins, nbOfScales, patchRadius,
//                        searchRadius, useRandomPixelOrder, nbOfCores
//            float32[2] = histogramDistanceThreshold, minEigenValue
//            float32[h*w*3]        color        (line-major, depth minor —
//            float32[h*w]          nbOfSamples   DeepImage::glueIndices
//            float32[h*w*nbOfBins] histograms    layout == numpy (H,W,D))
//            float32[h*w*6]        covariances  (xx,yy,zz,yz,xz,xy)
//   out.bin: float32[h*w*3] denoised color
//
// Determinism note: we set m_markedPixelsSkippingProbability = 0 so every
// pixel is denoised and the summed-estimate aggregation is order-independent
// (Denoiser.cpp accumulates per-core images and reduces) — this is the
// semantics bcd_tpu's exact path implements (see DESIGN.md section 1).
//
// Accumulator mode (round-3 verdict item 6): `ref_driver --acc in out`
// streams a raw sample dump through the upstream SamplesAccumulator
// (SamplesAccumulator.cpp:44-141) so bcd_tpu's device binning can be
// diffed against the upstream ingest semantics, not just the denoiser.
//   in.bin:  int32[4]  = w, h, spp, nbOfBins
//            float32[2] = gamma, maxValue
//            float32[h*w*spp*4] samples pixel-major (r, g, b, weight)
//   out.bin: float32[h*w]   nbOfSamples,  float32[h*w*3] mean,
//            float32[h*w*6] covariances,  float32[h*w*3*bins] histograms

#include "Denoiser.h"
#include "MultiscaleDenoiser.h"
#include "DeepImage.h"
#include "IDenoiser.h"
#include "SamplesAccumulator.h"

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <vector>

static void readf(FILE* f, void* p, size_t n)
{
    if (fread(p, 1, n, f) != n) {
        std::fprintf(stderr, "ref_driver: short read\n");
        std::exit(2);
    }
}

static int runAccumulator(const char* inPath, const char* outPath)
{
    FILE* f = std::fopen(inPath, "rb");
    if (!f) { std::perror("ref_driver: open in.bin"); return 2; }
    int32_t hdr[4];
    float fhdr[2];
    readf(f, hdr, sizeof hdr);
    readf(f, fhdr, sizeof fhdr);
    const int w = hdr[0], h = hdr[1], spp = hdr[2], bins = hdr[3];

    bcd::HistogramParameters hp;
    hp.m_nbOfBins = bins;
    hp.m_gamma = fhdr[0];
    hp.m_maxValue = fhdr[1];
    bcd::SamplesAccumulator acc(w, h, hp);

    std::vector<float> row(static_cast<size_t>(w) * spp * 4);
    for (int line = 0; line < h; ++line) {
        readf(f, row.data(), sizeof(float) * row.size());
        for (int col = 0; col < w; ++col)
            for (int s = 0; s < spp; ++s) {
                const float* sm = &row[(static_cast<size_t>(col) * spp + s) * 4];
                acc.addSample(line, col, sm[0], sm[1], sm[2], sm[3]);
            }
    }
    std::fclose(f);

    bcd::SamplesStatisticsImages stats = acc.extractSamplesStatistics();
    FILE* g = std::fopen(outPath, "wb");
    if (!g) { std::perror("ref_driver: open out.bin"); return 2; }
    const bcd::DeepImage<float>* imgs[4] = {
        &stats.m_nbOfSamplesImage, &stats.m_meanImage,
        &stats.m_covarImage, &stats.m_histoImage };
    for (const bcd::DeepImage<float>* im : imgs)
        std::fwrite(im->getDataPtr(), sizeof(float), im->getSize(), g);
    std::fclose(g);
    return 0;
}

int main(int argc, char** argv)
{
    if (argc == 4 && std::strcmp(argv[1], "--acc") == 0)
        return runAccumulator(argv[2], argv[3]);
    if (argc != 3) {
        std::fprintf(stderr,
                     "usage: ref_driver [--acc] in.bin out.bin\n");
        return 1;
    }
    FILE* f = std::fopen(argv[1], "rb");
    if (!f) { std::perror("ref_driver: open in.bin"); return 2; }

    int32_t hdr[8];
    float fhdr[2];
    readf(f, hdr, sizeof hdr);
    readf(f, fhdr, sizeof fhdr);
    const int w = hdr[0], h = hdr[1], bins = hdr[2], scales = hdr[3];
    const int patchR = hdr[4], searchR = hdr[5];
    const int randomOrder = hdr[6], cores = hdr[7];

    bcd::DeepImage<float> color(w, h, 3), nb(w, h, 1);
    bcd::DeepImage<float> histo(w, h, bins), cov(w, h, 6);
    readf(f, color.getDataPtr(), sizeof(float) * color.getSize());
    readf(f, nb.getDataPtr(), sizeof(float) * nb.getSize());
    readf(f, histo.getDataPtr(), sizeof(float) * histo.getSize());
    readf(f, cov.getDataPtr(), sizeof(float) * cov.getSize());
    std::fclose(f);

    bcd::DeepImage<float> out(w, h, 3);

    bcd::DenoiserInputs inputs;
    inputs.m_pColors = &color;
    inputs.m_pNbOfSamples = &nb;
    inputs.m_pHistograms = &histo;
    inputs.m_pSampleCovariances = &cov;

    bcd::DenoiserOutputs outputs;
    outputs.m_pDenoisedColors = &out;

    bcd::DenoiserParameters params;
    params.m_histogramDistanceThreshold = fhdr[0];
    params.m_minEigenValue = fhdr[1];
    params.m_patchRadius = patchR;
    params.m_searchWindowRadius = searchR;
    params.m_useRandomPixelOrder = randomOrder != 0;
    params.m_markedPixelsSkippingProbability = 0.f;  // denoise every pixel
    params.m_nbOfCores = cores;
    params.m_useCuda = false;

    std::unique_ptr<bcd::IDenoiser> denoiser;
    if (scales > 1)
        denoiser.reset(new bcd::MultiscaleDenoiser(scales));
    else
        denoiser.reset(new bcd::Denoiser());
    denoiser->setInputs(inputs);
    denoiser->setOutputs(outputs);
    denoiser->setParameters(params);
    if (!denoiser->denoise()) {
        std::fprintf(stderr, "ref_driver: denoise() failed\n");
        return 3;
    }

    FILE* g = std::fopen(argv[2], "wb");
    if (!g) { std::perror("ref_driver: open out.bin"); return 2; }
    std::fwrite(out.getDataPtr(), sizeof(float), out.getSize(), g);
    std::fclose(g);
    return 0;
}
