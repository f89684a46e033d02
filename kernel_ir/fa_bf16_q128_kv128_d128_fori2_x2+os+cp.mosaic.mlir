module @_fori_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg4: memref<1x4x2048x128xbf16, #tpu.memory_space<any>>, %arg5: memref<1x4x2048x128xbf16, #tpu.memory_space<any>>, %arg6: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<2x128x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<2x128x128xbf16, #tpu.memory_space<vmem>>, %arg9: memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>], iteration_bounds = array<i64: 1, 4, 16>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 128, 128>}, {}, {}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 128, 128>}]} {
    %cst = arith.constant dense<0.127517432> : vector<128x128xf32>
    %cst_0 = arith.constant dense<-1.000000e+30> : vector<128x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<128xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<128xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<128x128xf32>
    %c2_i32 = arith.constant 2 : i32
    %c16_i32 = arith.constant 16 : i32
    %c1_i32 = arith.constant 1 : i32
    %c0 = arith.constant 0 : index
    %c0_i32 = arith.constant 0 : i32
    %c128_i32 = arith.constant 128 : i32
    %0 = vector.load %arg3[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %1 = vector.shape_cast %0 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %2 = tpu.memref_slice %arg4[%arg0, %arg1, %c0_i32, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
    %3 = tpu.memref_squeeze %2 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
    %4 = tpu.memref_slice %arg7[%c0_i32, %c0_i32, %c0_i32] : memref<2x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
    %5 = tpu.memref_squeeze %4 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
    %6 = tpu.memref_slice %arg9[%c0_i32, %c0_i32] : memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    %7 = tpu.memref_squeeze %6 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    tpu.enqueue_dma source(%3 : memref<128x128xbf16, #tpu.memory_space<any>>) target(%5 : memref<128x128xbf16, #tpu.memory_space<vmem>>) target_semaphore(%7 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>)
    %8 = tpu.memref_slice %arg5[%arg0, %arg1, %c0_i32, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
    %9 = tpu.memref_squeeze %8 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
    %10 = tpu.memref_slice %arg8[%c0_i32, %c0_i32, %c0_i32] : memref<2x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
    %11 = tpu.memref_squeeze %10 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
    %12 = tpu.memref_slice %arg9[%c1_i32, %c0_i32] : memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    %13 = tpu.memref_squeeze %12 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    tpu.enqueue_dma source(%9 : memref<128x128xbf16, #tpu.memory_space<any>>) target(%11 : memref<128x128xbf16, #tpu.memory_space<vmem>>) target_semaphore(%13 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>)
    %14:3 = scf.for %arg10 = %c0_i32 to %c16_i32 step %c1_i32 iter_args(%arg11 = %cst_0, %arg12 = %cst_3, %arg13 = %cst_3) -> (vector<128x128xf32>, vector<128x128xf32>, vector<128x128xf32>)  : i32 {
      %20 = arith.remsi %arg10, %c2_i32 : i32
      %21 = arith.addi %arg10, %c1_i32 : i32
      %22 = arith.remsi %21, %c2_i32 : i32
      %23 = arith.addi %arg10, %c1_i32 : i32
      %24 = arith.cmpi slt, %23, %c16_i32 : i32
      scf.if %24 {
        %67 = arith.addi %arg10, %c1_i32 : i32
        %68 = arith.muli %67, %c128_i32 : i32
        %69 = tpu.memref_slice %arg4[%arg0, %arg1, %68, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
        %70 = tpu.memref_squeeze %69 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
        %71 = tpu.memref_slice %arg7[%22, %c0_i32, %c0_i32] : memref<2x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
        %72 = tpu.memref_squeeze %71 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
        %73 = tpu.memref_slice %arg9[%c0_i32, %22] : memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        %74 = tpu.memref_squeeze %73 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        tpu.enqueue_dma source(%70 : memref<128x128xbf16, #tpu.memory_space<any>>) target(%72 : memref<128x128xbf16, #tpu.memory_space<vmem>>) target_semaphore(%74 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>)
        %75 = tpu.memref_slice %arg5[%arg0, %arg1, %68, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
        %76 = tpu.memref_squeeze %75 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
        %77 = tpu.memref_slice %arg8[%22, %c0_i32, %c0_i32] : memref<2x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
        %78 = tpu.memref_squeeze %77 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
        %79 = tpu.memref_slice %arg9[%c1_i32, %22] : memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        %80 = tpu.memref_squeeze %79 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        tpu.enqueue_dma source(%76 : memref<128x128xbf16, #tpu.memory_space<any>>) target(%78 : memref<128x128xbf16, #tpu.memory_space<vmem>>) target_semaphore(%80 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>)
      }
      %25 = arith.muli %arg10, %c128_i32 : i32
      %26 = tpu.memref_slice %arg4[%arg0, %arg1, %25, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
      %27 = tpu.memref_squeeze %26 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
      %28 = tpu.memref_slice %arg7[%20, %c0_i32, %c0_i32] : memref<2x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
      %29 = tpu.memref_squeeze %28 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
      %30 = tpu.memref_slice %arg9[%c0_i32, %20] : memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %31 = tpu.memref_squeeze %30 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      tpu.wait_dma2 semaphore(%31 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) src(%27 : memref<128x128xbf16, #tpu.memory_space<any>>) dst(%29 : memref<128x128xbf16, #tpu.memory_space<vmem>>)
      %32 = tpu.memref_slice %arg5[%arg0, %arg1, %25, %c0_i32] : memref<1x4x2048x128xbf16, #tpu.memory_space<any>> -> memref<1x1x128x128xbf16, #tpu.memory_space<any>>
      %33 = tpu.memref_squeeze %32 : memref<1x1x128x128xbf16, #tpu.memory_space<any>> -> memref<128x128xbf16, #tpu.memory_space<any>>
      %34 = tpu.memref_slice %arg8[%20, %c0_i32, %c0_i32] : memref<2x128x128xbf16, #tpu.memory_space<vmem>> -> memref<1x128x128xbf16, #tpu.memory_space<vmem>>
      %35 = tpu.memref_squeeze %34 : memref<1x128x128xbf16, #tpu.memory_space<vmem>> -> memref<128x128xbf16, #tpu.memory_space<vmem>>
      %36 = tpu.memref_slice %arg9[%c1_i32, %20] : memref<2x2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %37 = tpu.memref_squeeze %36 : memref<1x1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>> -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      tpu.wait_dma2 semaphore(%37 : memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) src(%33 : memref<128x128xbf16, #tpu.memory_space<any>>) dst(%35 : memref<128x128xbf16, #tpu.memory_space<vmem>>)
      %38 = arith.index_cast %20 : i32 to index
      %39 = vector.load %arg7[%38, %c0, %c0] : memref<2x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x128x128xbf16>
      %40 = vector.shape_cast %39 : vector<1x128x128xbf16> to vector<128x128xbf16>
      %41 = tpu.matmul %1, %40, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
      %42 = arith.index_cast %20 : i32 to index
      %43 = vector.load %arg8[%42, %c0, %c0] : memref<2x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x128x128xbf16>
      %44 = vector.shape_cast %43 : vector<1x128x128xbf16> to vector<128x128xbf16>
      %45 = arith.mulf %41, %cst : vector<128x128xf32>
      %46 = vector.multi_reduction <maximumf>, %45, %cst_2 [1] : vector<128x128xf32> to vector<128xf32>
      %47 = vector.shape_cast %46 : vector<128xf32> to vector<128x1xf32>
      %48 = vector.broadcast %47 : vector<128x1xf32> to vector<128x128xf32>
      %49 = arith.maximumf %arg11, %48 : vector<128x128xf32>
      %50 = vector.extract_strided_slice %49 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
      %51 = vector.broadcast %50 : vector<128x1xf32> to vector<128x128xf32>
      %52 = arith.subf %45, %51 : vector<128x128xf32>
      %53 = math.exp2 %52 : vector<128x128xf32>
      %54 = arith.subf %arg11, %49 : vector<128x128xf32>
      %55 = math.exp2 %54 : vector<128x128xf32>
      %56 = arith.truncf %53 : vector<128x128xf32> to vector<128x128xbf16>
      %57 = arith.mulf %arg12, %55 : vector<128x128xf32>
      %58 = vector.multi_reduction <add>, %53, %cst_1 [1] : vector<128x128xf32> to vector<128xf32>
      %59 = vector.shape_cast %58 : vector<128xf32> to vector<128x1xf32>
      %60 = vector.broadcast %59 : vector<128x1xf32> to vector<128x128xf32>
      %61 = arith.addf %57, %60 : vector<128x128xf32>
      %62 = tpu.matmul %56, %44, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
      %63 = vector.extract_strided_slice %55 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
      %64 = vector.broadcast %63 : vector<128x1xf32> to vector<128x128xf32>
      %65 = arith.mulf %arg13, %64 : vector<128x128xf32>
      %66 = arith.addf %65, %62 : vector<128x128xf32>
      scf.yield %49, %61, %66 : vector<128x128xf32>, vector<128x128xf32>, vector<128x128xf32>
    }
    %15 = vector.extract_strided_slice %14#1 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
    %16 = vector.broadcast %15 : vector<128x1xf32> to vector<128x128xf32>
    %17 = arith.divf %14#2, %16 : vector<128x128xf32>
    %18 = arith.truncf %17 : vector<128x128xf32> to vector<128x128xbf16>
    %19 = vector.shape_cast %18 : vector<128x128xbf16> to vector<1x1x128x128xbf16>
    tpu.vector_store %arg6[%c0, %c0, %c0, %c0], %19 {strides = array<i32>} : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>, 
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

